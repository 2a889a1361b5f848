package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Remaining aggregate surface (SURVEY.md §2.12): exact percentiles,
  * ordered collect_list, HLL approx-distinct, JSON construction.
  */
object AggregatesPlus {
  type Q = (SparkSession, String) => DataFrame

  /** Exact interpolated percentiles (same (n-1)*p interpolation as the
    * oracle's quantile_cont). percentile_approx exists for the 100 TB
    * path but is sketch-based → checked rows-only in a3.
    */
  val a1Percentile: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(array_join(expr(
             // fixed-scale decimal strings: double→string formatting is
             // engine-specific, DECIMAL(18,4) rendering is not
             "transform(percentile(o_totalprice, array(0.5D, 0.9D)), x -> cast(cast(x as decimal(18,4)) as string))"), ",")
             .as("price_quantiles"),
           count(lit(1)).as("n"))

  /** collect_list made deterministic: sort, take first 5. */
  val a2CollectList: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(array_join(slice(sort_array(collect_list(col("o_orderkey"))), 1, 5), ",")
             .as("first_keys"),
           count(lit(1)).as("n"))

  /** approx_count_distinct (HLL++): sketch values are engine-specific,
    * so no SQL oracle — the driver records a rows-only check; the
    * EXACT distinct lives alongside so the result is self-evidently
    * sane (approx within a few % of exact).
    */
  val a3ApproxDistinct: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
           countDistinct(col("o_custkey")).as("exact_custs"))

  /** from_json parse + to_json construction round-trip. */
  val a4JsonRoundtrip: Q = (s, d) =>
    events(s, d)
      .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k"))
      .filter(col("k") % 100 === 7)
      .select(col("event_id"),
              to_json(struct(col("k"), col("event_type"))).as("doc"))

  val queries: Map[String, Q] = Map(
    "a1_percentile" -> a1Percentile,
    "a2_collect_list" -> a2CollectList,
    "a3_approx_distinct" -> a3ApproxDistinct,
    "a4_json_roundtrip" -> a4JsonRoundtrip,
  )

  val oracles: Map[String, String] = Map(
    "a1_percentile" ->
      """SELECT o_orderstatus,
        | array_to_string([CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)
        |                  for x in quantile_cont(o_totalprice, [0.5, 0.9])], ',') AS price_quantiles,
        | count(1) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "a2_collect_list" ->
      """SELECT o_orderpriority,
        | array_to_string((list_sort(list(o_orderkey)))[1:5], ',') AS first_keys, count(1) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // a3_approx_distinct intentionally omitted (sketch, not portable)
    "a4_json_roundtrip" ->
      """SELECT event_id,
        | '{"k":' || k || ',"event_type":"' || event_type || '"}' AS doc
        |FROM (SELECT event_id, event_type,
        |        CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |      FROM events)
        |WHERE k % 100 = 7""".stripMargin,
  )
}
