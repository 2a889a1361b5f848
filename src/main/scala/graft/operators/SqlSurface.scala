package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables._

/** SQL front-end surface: the same engine through `spark.sql` —
  * TPC-H-shaped composite queries and the subquery forms (correlated
  * scalar, IN-over-aggregate, EXISTS) that the DataFrame modules
  * express as joins. Catalyst plans both identically; these pin the
  * SQL path and subquery decorrelation.
  *
  * Numeric rule as everywhere: double sums through exact DECIMAL
  * (identical text works in both dialects), so each oracle is nearly
  * the Spark SQL string itself.
  */
object SqlSurface {
  type Q = (SparkSession, String) => DataFrame

  private def views(s: SparkSession, d: String): Unit = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    lineitem(s, d).createOrReplaceTempView("lineitem")
    nation(s, d).createOrReplaceTempView("nation")
  }

  private val moneySum4 =
    "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE), 4)"

  /** TPC-H Q3 shape: unshipped-order revenue top-10. Shared dialect. */
  private val q3Sql =
    s"""SELECT o_orderkey, $moneySum4 AS revenue, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15'
       |  AND l_shipdate > TIMESTAMP '1998-03-15'
       |GROUP BY o_orderkey, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  val x1TpchQ3: Q = (s, d) => { views(s, d); s.sql(q3Sql) }

  /** TPC-H Q10 shape: revenue lost to returned items, per customer. */
  private val q10Sql =
    s"""SELECT c_custkey, n_name, $moneySum4 AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val x2TpchQ10: Q = (s, d) => { views(s, d); s.sql(q10Sql) }

  /** TPC-H Q18 shape: IN over an aggregated+HAVING subquery. */
  private val q18Sql =
    """SELECT o_orderkey, count(1) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 220)
      |GROUP BY o_orderkey""".stripMargin

  val x3TpchQ18: Q = (s, d) => { views(s, d); s.sql(q18Sql) }

  /** Correlated scalar subquery: orders twice their customer's exact
    * (decimal-summed) average price.
    */
  private val corrSql =
    """SELECT o.o_orderkey, o.o_custkey
      |FROM orders o
      |WHERE o.o_totalprice > 2 * (
      |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(1)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  val x4Correlated: Q = (s, d) => { views(s, d); s.sql(corrSql) }

  /** EXISTS subquery form (decorrelated to a semi join by Catalyst). */
  private val existsSql =
    """SELECT n_name, count(1) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name""".stripMargin

  val x5Exists: Q = (s, d) => { views(s, d); s.sql(existsSql) }

  val queries: Map[String, Q] = Map(
    "x1_tpch_q3" -> x1TpchQ3,
    "x2_tpch_q10" -> x2TpchQ10,
    "x3_tpch_q18" -> x3TpchQ18,
    "x4_correlated_scalar" -> x4Correlated,
    "x5_exists_subquery" -> x5Exists,
  )

  // The SQL is ANSI enough to run verbatim in DuckDB.
  val oracles: Map[String, String] = Map(
    "x1_tpch_q3" -> q3Sql,
    "x2_tpch_q10" -> q10Sql,
    "x3_tpch_q18" -> q18Sql,
    "x4_correlated_scalar" -> corrSql,
    "x5_exists_subquery" -> existsSql,
  )
}
