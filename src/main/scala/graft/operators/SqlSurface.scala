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
    supplier(s, d).createOrReplaceTempView("supplier")
    region(s, d).createOrReplaceTempView("region")
    part(s, d).createOrReplaceTempView("part")
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

  /** TPC-H Q5 shape: local-supplier volume — 6-way join where the
    * customer's and supplier's nation must coincide, revenue per
    * nation inside one region. Dims (nation, region, supplier)
    * broadcast; the fact-fact chain shuffles on its keys.
    */
  private val q5Sql =
    s"""SELECT n_name, $moneySum4 AS revenue, count(1) AS n_items
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name""".stripMargin

  val x6TpchQ5: Q = (s, d) => { views(s, d); s.sql(q5Sql) }

  /** TPC-H Q12 shape: priority-class line counts per linestatus in a
    * ship-year (the testdata lineitem has no shipmode column, so
    * linestatus plays its grouping role).
    */
  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  val x7TpchQ12: Q = (s, d) => { views(s, d); s.sql(q12Sql) }

  /** TPC-H Q14 shape: promo revenue share — conditional aggregation
    * ratio over a month of shipments (exact decimal sums on both
    * numerator and denominator, double division, fixed rounding).
    */
  private val q14Sql =
    """SELECT
      |  round(100.0 *
      |    CAST(sum(CASE WHEN p_type = 'PROMO'
      |                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))
      |                  ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE) /
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE),
      |    6) AS promo_revenue_pct,
      |  count(1) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  val x8TpchQ14: Q = (s, d) => { views(s, d); s.sql(q14Sql) }

  /** TPC-H Q19 shape: disjunction of brand/size/quantity bands — the
    * OR-of-ANDs predicate Catalyst must keep partially pushable.
    */
  private val q19Sql =
    s"""SELECT $moneySum4 AS revenue, count(1) AS n_items
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity >= 1 AND l_quantity <= 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |       AND l_quantity >= 10 AND l_quantity <= 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 5
       |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  val x9TpchQ19: Q = (s, d) => { views(s, d); s.sql(q19Sql) }

  /** TPC-H Q22 shape: positive-balance customers inactive since 1999
    * (every synthetic customer has SOME order, so "inactive" is
    * date-bounded like Q22's 7-year window) — uncorrelated scalar
    * subquery (exact-decimal average) + NOT EXISTS anti join, grouped
    * by nation.
    */
  private val q22Sql =
    """SELECT c_nationkey, count(1) AS numcust,
      | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(1)
      |  FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey""".stripMargin

  val x10TpchQ22: Q = (s, d) => { views(s, d); s.sql(q22Sql) }

  /** TPC-H Q4 shape: order-priority counts for orders with at least
    * one late-shipping line (the testdata lineitem has no
    * commit/receipt dates, so "late" is ship-lag vs order date) —
    * EXISTS decorrelated into a semi join.
    */
  private val q4Sql =
    """SELECT o_orderpriority, count(1) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  val x11TpchQ4: Q = (s, d) => { views(s, d); s.sql(q4Sql) }

  /** TPC-H Q7 shape: bilateral shipping volume between two nations by
    * ship year — the double-nation-role join (nation joined twice
    * under different aliases) plus a disjunctive pair predicate.
    */
  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  round(CAST(sum(CAST(volume AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
      |  count(1) AS n_items
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         year(l_shipdate) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  val x12TpchQ7: Q = (s, d) => { views(s, d); s.sql(q7Sql) }

  /** TPC-H Q8 shape: one nation's market share of PROMO-part volume
    * inside one region, by order year — conditional-sum ratio (both
    * sums exact decimal, one double division, fixed rounding).
    */
  private val q8Sql =
    """SELECT o_year,
      |  round(
      |    CAST(sum(CASE WHEN nation = 'NATION_3'
      |                  THEN CAST(volume AS DECIMAL(22,4))
      |                  ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE) /
      |    CAST(sum(CAST(volume AS DECIMAL(22,4))) AS DOUBLE),
      |    6) AS mkt_share,
      |  count(1) AS n_items
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |         l_extendedprice * (1 - l_discount) AS volume,
      |         n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |) all_nations
      |GROUP BY o_year""".stripMargin

  val x13TpchQ8: Q = (s, d) => { views(s, d); s.sql(q8Sql) }

  /** TPC-H Q13 shape: distribution of customers by order count —
    * LEFT OUTER join with an extra ON predicate (so customers with
    * only excluded orders still count as zero) and a two-level
    * aggregation.
    */
  private val q13Sql =
    """SELECT c_count, count(1) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count""".stripMargin

  val x14TpchQ13: Q = (s, d) => { views(s, d); s.sql(q13Sql) }

  /** TPC-H Q6 shape: forecast-revenue-change — the pure scan-filter
    * aggregate (no join at all); at scale this is the query whose
    * entire cost is parquet pushdown, so the plan must show every
    * predicate reaching the scan.
    */
  private val q6Sql =
    """SELECT
      |  round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(22,4))) AS DOUBLE), 4)
      |    AS revenue,
      |  count(1) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  val x15TpchQ6: Q = (s, d) => { views(s, d); s.sql(q6Sql) }

  /** TPC-H Q9 shape: product-line profit by supplier nation and order
    * year. The testdata has no partsupp, so part.p_retailprice plays
    * ps_supplycost's role in the profit expression — the plan shape
    * (5-way join, LIKE-filtered part dim, two-key grouping over a
    * computed measure) is Q9's.
    */
  private val q9Sql =
    """SELECT nation, o_year,
      |  round(CAST(sum(CAST(amount AS DECIMAL(22,4))) AS DOUBLE), 4) AS sum_profit,
      |  count(1) AS n_items
      |FROM (
      |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%gear%'
      |) profit
      |GROUP BY nation, o_year""".stripMargin

  val x16TpchQ9: Q = (s, d) => { views(s, d); s.sql(q9Sql) }

  /** TPC-H Q11 shape: important-stock value — per-key aggregate kept
    * only when it exceeds a FRACTION OF THE GLOBAL aggregate (HAVING
    * over an uncorrelated scalar subquery). lineitem value per part
    * plays partsupp stock value.
    */
  private val q11Sql =
    """SELECT l_partkey,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(22,4))) AS DOUBLE), 4) AS value
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(22,4))) AS DOUBLE) > (
      |  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(22,4))) AS DOUBLE) * 0.00065
      |  FROM lineitem)""".stripMargin

  val x17TpchQ11: Q = (s, d) => { views(s, d); s.sql(q11Sql) }

  /** TPC-H Q15 shape: top supplier — a CTE aggregated once, then
    * consumed TWICE (join source + scalar-max subquery); exact decimal
    * revenue makes the max-equality safe in both dialects.
    */
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
      |           AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin

  val x18TpchQ15: Q = (s, d) => { views(s, d); s.sql(q15Sql) }

  /** TPC-H Q16 shape: distinct-supplier counts per part attribute
    * combo, with a NOT IN exclusion subquery (negative-balance
    * suppliers play Q16's complaint suppliers). lineitem supplies the
    * part↔supplier pairs partsupp would.
    */
  private val q16Sql =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#15' AND p_type <> 'ECONOMY'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  val x19TpchQ16: Q = (s, d) => { views(s, d); s.sql(q16Sql) }

  /** TPC-H Q17 shape: small-quantity-order revenue — per-row predicate
    * against a CORRELATED per-part average (exact decimal sum/count
    * division on both sides keeps the double compare bit-identical).
    */
  private val q17Sql =
    """SELECT
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(22,4))) AS DOUBLE) / 7.0, 4)
      |    AS avg_yearly,
      |  count(1) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_type = 'PROMO'
      |  AND l_quantity < 0.5 * (
      |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1)
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  val x20TpchQ17: Q = (s, d) => { views(s, d); s.sql(q17Sql) }

  /** TPC-H Q20 shape: suppliers of filtered parts above a shipped-
    * quantity threshold — IN over a GROUP BY + HAVING subquery, then a
    * dim join for the report. lineitem again plays partsupp/availqty.
    */
  private val q20Sql =
    """SELECT s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 380)""".stripMargin

  val x21TpchQ20: Q = (s, d) => { views(s, d); s.sql(q20Sql) }

  /** TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    * finished multi-supplier order — the EXISTS + NOT EXISTS pair on
    * the same fact table, both correlated on the outer order AND its
    * date (ship-lag > 60 days plays commitdate lateness, as in x11).
    */
  private val q21Sql =
    """SELECT s_name, count(1) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name""".stripMargin

  val x22TpchQ21: Q = (s, d) => { views(s, d); s.sql(q21Sql) }

  /** TPC-H Q2 shape: minimum-cost supplier per part within a region —
    * the correlated-min-over-a-shared-CTE form. Supply cost is derived
    * from lineitem (min unit price per part/supplier pair); the CTE is
    * consumed by the outer join tree AND re-filtered inside the
    * correlated subquery, exactly Q2's partsupp double-use.
    */
  private val q2Sql =
    """WITH supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part
      |JOIN supply ON p_partkey = ps_partkey
      |JOIN supplier ON s_suppkey = ps_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT min(sp2.ps_supplycost)
      |    FROM supply sp2
      |    JOIN supplier su2 ON su2.s_suppkey = sp2.ps_suppkey
      |    JOIN nation n2 ON su2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE sp2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')""".stripMargin

  val x23TpchQ2: Q = (s, d) => { views(s, d); s.sql(q2Sql) }

  /** LATERAL correlated subquery — the per-outer-row dependent join
    * (top-2 customers per nation). Catalyst decorrelates the
    * ORDER BY + LIMIT lateral into a window-ranked join; the SQL form
    * is the one users port from Postgres/DuckDB pipelines.
    */
  private val lateralSql =
    """SELECT n_name, t.c_custkey, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin

  val x24Lateral: Q = (s, d) => { views(s, d); s.sql(lateralSql) }

  /** WITH RECURSIVE — SQL:1999 recursion (Spark 4's recursive-CTE
    * front end): the recursive member generates an 80-step month
    * ladder over the orders span (well under the default recursion
    * limit), then a LEFT equi join on the truncated month buckets the
    * fact table against the generated calendar. The generated side is
    * iterations-bounded — it never grows with the corpus — so the
    * join broadcasts and the corpus-side work is one scan + one hash
    * aggregation at any scale. Identical text runs in DuckDB.
    */
  private val recSql =
    """WITH RECURSIVE months(m) AS (
      |  SELECT TIMESTAMP '1995-01-01'
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01'
      |)
      |SELECT m, count(o_orderkey) AS n_orders
      |FROM months LEFT JOIN orders ON date_trunc('MONTH', o_orderdate) = m
      |GROUP BY m""".stripMargin

  val x25RecursiveCte: Q = (s, d) => { views(s, d); s.sql(recSql) }

  /** GROUP BY ALL (infer the grouping set from the non-aggregate
    * select items — the analyst-ergonomics form both engines added):
    * one SQL string serves as query AND oracle, so the test is that
    * both FRONT-ENDS infer the same grouping.
    */
  private val gbaSql =
    """SELECT l_returnflag, l_linestatus, count(1) AS n,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS sum_qty
      |FROM lineitem
      |GROUP BY ALL""".stripMargin

  val x26GroupByAll: Q = (s, d) => { views(s, d); s.sql(gbaSql) }

  /** ORDER BY ALL (sort by every select item left-to-right — the
    * companion ergonomics form to GROUP BY ALL): one SQL string is
    * both query and oracle. The sort key set is the full output row,
    * so the result order is total and the hash compare is exercised
    * on an ORDER-insensitive gate anyway — what this pins is that
    * both front-ends RESOLVE the same implicit sort columns.
    */
  private val obaSql =
    """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
      |  min(o_orderkey) AS min_key
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  val x27OrderByAll: Q = (s, d) => { views(s, d); s.sql(obaSql) }

  /** LIMIT … OFFSET paging over a totally-ordered result (tie-broken
    * by key, so page contents are deterministic). At scale OFFSET+LIMIT
    * plans as a single TakeOrderedAndProject of the first
    * offset+limit rows — no global sort materializes; the page window
    * must stay small relative to the corpus, which is exactly the
    * pagination contract. One SQL string serves both engines.
    */
  private val pageSql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 7""".stripMargin

  val x28LimitOffset: Q = (s, d) => { views(s, d); s.sql(pageSql) }

  /** Named WINDOW clause (one definition, many OVER references — the
    * front-end form that keeps multi-window queries single-sourced).
    * Both OVER w references resolve to the same named definitions, and
    * the identical text runs in DuckDB, so the gate pins that both
    * front-ends bind named windows the same way. Catalyst plans the
    * two windows over ONE user_id exchange (the rank's sort subsumes
    * the count's clustering).
    */
  private val winClauseSql =
    """SELECT user_id, event_id, rn, n_user FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER w AS rn,
      |    count(1) OVER w2 AS n_user
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |         w2 AS (PARTITION BY user_id)
      |) AS q WHERE rn <= 2""".stripMargin

  val x29WindowClause: Q = (s, d) => {
    graft.sources.Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(winClauseSql)
  }

  /** SQL PIVOT clause (the front-end form of c8's DataFrame pivot):
    * rows → columns with named pivot values. Catalyst lowers it to the
    * same CASE-per-value hash aggregate the oracle spells out, so the
    * plan stays one exchange on the group key at any scale — pivot
    * width is COLUMN count, never a shuffle dimension. (DuckDB's PIVOT
    * statement has different syntax, so unlike x26/x27 the oracle is
    * the semantic CASE expansion, not the same string.)
    */
  private val pivotSql =
    """SELECT * FROM (
      |  SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders
      |) PIVOT (
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
      |  FOR o_orderpriority IN ('1-URGENT' AS urgent, '5-LOW' AS low)
      |)""".stripMargin

  val x30PivotSql: Q = (s, d) => { views(s, d); s.sql(pivotSql) }

  /** Aggregate FILTER clause (SQL-standard per-aggregate predicates —
    * the form that replaces CASE-WHEN-wrapped aggregates): one SQL
    * string is query and oracle. Catalyst compiles each FILTER into
    * the aggregate's own predicate, so the plan is still ONE hash
    * aggregate over one scan — per-aggregate filters never fork the
    * pipeline.
    */
  private val filterClauseSql =
    """SELECT o_orderstatus, count(1) AS n,
      |  count(1) FILTER (WHERE o_totalprice > 100000) AS n_big,
      |  min(o_orderkey) FILTER (WHERE o_orderpriority = '1-URGENT')
      |    AS min_urgent
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  val x31FilterClause: Q = (s, d) => { views(s, d); s.sql(filterClauseSql) }

  /** Inline VALUES table constructor joined as a dimension — the
    * literal-lookup-table idiom (status code → display name) with one
    * SQL string for both engines. Catalyst plans the VALUES side as a
    * LocalRelation and broadcasts it: a literal dim never shuffles the
    * fact side beyond the aggregate's own exchange.
    */
  private val valuesSql =
    """SELECT t.grp, count(1) AS n, min(o_orderkey) AS min_key
      |FROM orders JOIN (VALUES ('P', 'pending'), ('O', 'open'),
      |                         ('F', 'final')) AS t(st, grp)
      |  ON o_orderstatus = t.st
      |GROUP BY t.grp""".stripMargin

  val x32ValuesClause: Q = (s, d) => { views(s, d); s.sql(valuesSql) }

  val queries: Map[String, Q] = Map(
    "x30_pivot_sql" -> x30PivotSql,
    "x31_filter_clause" -> x31FilterClause,
    "x32_values_clause" -> x32ValuesClause,
    "x29_window_clause" -> x29WindowClause,
    "x27_order_by_all" -> x27OrderByAll,
    "x28_limit_offset" -> x28LimitOffset,
    "x26_group_by_all" -> x26GroupByAll,
    "x25_recursive_cte" -> x25RecursiveCte,
    "x24_lateral_topk" -> x24Lateral,
    "x1_tpch_q3" -> x1TpchQ3,
    "x2_tpch_q10" -> x2TpchQ10,
    "x3_tpch_q18" -> x3TpchQ18,
    "x4_correlated_scalar" -> x4Correlated,
    "x5_exists_subquery" -> x5Exists,
    "x6_tpch_q5" -> x6TpchQ5,
    "x7_tpch_q12" -> x7TpchQ12,
    "x8_tpch_q14" -> x8TpchQ14,
    "x9_tpch_q19" -> x9TpchQ19,
    "x10_tpch_q22" -> x10TpchQ22,
    "x11_tpch_q4" -> x11TpchQ4,
    "x12_tpch_q7" -> x12TpchQ7,
    "x13_tpch_q8" -> x13TpchQ8,
    "x14_tpch_q13" -> x14TpchQ13,
    "x15_tpch_q6" -> x15TpchQ6,
    "x16_tpch_q9" -> x16TpchQ9,
    "x17_tpch_q11" -> x17TpchQ11,
    "x18_tpch_q15" -> x18TpchQ15,
    "x19_tpch_q16" -> x19TpchQ16,
    "x20_tpch_q17" -> x20TpchQ17,
    "x21_tpch_q20" -> x21TpchQ20,
    "x22_tpch_q21" -> x22TpchQ21,
    "x23_tpch_q2" -> x23TpchQ2,
  )

  // The SQL is ANSI enough to run verbatim in DuckDB.
  val oracles: Map[String, String] = Map(
    "x31_filter_clause" -> filterClauseSql,
    "x32_values_clause" -> valuesSql,
    "x30_pivot_sql" ->
      """SELECT o_orderstatus,
        |  round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |    AS urgent,
        |  round(CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |    AS low
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "x29_window_clause" -> winClauseSql,
    "x27_order_by_all" -> obaSql,
    "x28_limit_offset" -> pageSql,
    "x26_group_by_all" -> gbaSql,
    "x25_recursive_cte" -> recSql,
    "x24_lateral_topk" -> lateralSql,
    "x1_tpch_q3" -> q3Sql,
    "x2_tpch_q10" -> q10Sql,
    "x3_tpch_q18" -> q18Sql,
    "x4_correlated_scalar" -> corrSql,
    "x5_exists_subquery" -> existsSql,
    "x6_tpch_q5" -> q5Sql,
    "x7_tpch_q12" -> q12Sql,
    "x8_tpch_q14" -> q14Sql,
    "x9_tpch_q19" -> q19Sql,
    "x10_tpch_q22" -> q22Sql,
    "x11_tpch_q4" -> q4Sql,
    "x12_tpch_q7" -> q7Sql,
    "x13_tpch_q8" -> q8Sql,
    "x14_tpch_q13" -> q13Sql,
    "x15_tpch_q6" -> q6Sql,
    "x16_tpch_q9" -> q9Sql,
    "x17_tpch_q11" -> q11Sql,
    "x18_tpch_q15" -> q15Sql,
    "x19_tpch_q16" -> q16Sql,
    "x20_tpch_q17" -> q17Sql,
    "x21_tpch_q20" -> q20Sql,
    "x22_tpch_q21" -> q21Sql,
    "x23_tpch_q2" -> q2Sql,
  )
}
