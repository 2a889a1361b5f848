package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.sources.Tables._
import graft.sources.Num._

/** Window functions, sorts, top-k and set operations (SURVEY.md §2.12).
  *
  * Windows are partitioned on a real key so the sort is per-group and
  * scales horizontally — except w5, whose semantics (global quartiles)
  * are inherently total-order; see its note. Bounded top-k
  * (`orderBy.limit`) runs as per-partition top-k + single-reduce merge
  * (TakeOrderedAndProject) — no full global sort.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** rank() top-3 orders per priority (deterministic tie-break). */
  val w1Rank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"),
              round(col("o_totalprice"), 2).as("price"), col("rnk"))
  }

  /** lag/lead: per-customer order-to-order price delta. */
  val w2LagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .filter(col("prev_price").isNotNull)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(dec2(col("o_totalprice")) - dec2(col("prev_price")), 2)
          .cast(DoubleType).as("price_delta"),
        col("next_key"))
  }

  /** Running sum over a rowsBetween frame (exact decimal arithmetic).
    *
    * Ordering is (l_linenumber, l_quantity), not l_linenumber alone:
    * the driver's TPC-H-ish corpus has duplicate (l_orderkey,
    * l_linenumber) pairs (118k at sf0.1), so l_linenumber is NOT a
    * total order within an order and a ROWS-frame running sum over it
    * is engine-nondeterministic on tie rows — it passed at
    * sf0.01/sf1 only because both engines happened to scan ties in
    * the same arrival order, and the 100-copy sf10 replica broke that
    * luck (0.53% of rows mismatched). Adding the summed value itself
    * as the tiebreaker makes the OUTPUT multiset order-invariant:
    * rows still tied after (l_linenumber, l_quantity) have equal
    * quantity, so every ordering of them yields the same set of
    * prefix sums. (The w-family's other frames are tie-safe already:
    * unique-key tiebreakers or RANGE frames, which treat ties as
    * peers.)
    */
  val w3Running: Q = (s, d) => {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
              sum(dec2(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
  }

  /** rangeBetween frame: rolling 10-minute sum of event value per user.
    * Ordering key is epoch millis (int64) so Spark (µs) and the oracle
    * (ns) floor to identical values.
    */
  val w4RangeFrame: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-600000L, 0L)
    events(s, d)
      .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
      .select(col("user_id"), col("event_id"),
              sum(dec2(col("value"))).over(w).cast(DoubleType).as("rolling_value"))
  }

  /** dense_rank + ntile quartiles of customers by account balance —
    * GLOBAL ranking semantics, but NOT the single-task
    * `Window.orderBy` plan: routed through Scale.globalRankNtile's
    * two-pass range-partitioned form, so the sort parallelizes across
    * ranges at any input size (ScaleSpec pins both the equivalence to
    * the naive global window and the absence of a SinglePartition
    * exchange). The sort key is ascending-normalized: (-acctbal,
    * custkey) == (acctbal DESC, custkey).
    */
  val w5NtileDense: Q = (s, d) =>
    Scale.globalRankNtile(
        customer(s, d), Seq(negate(col("c_acctbal")), col("c_custkey")), 4)
      .select(col("c_custkey"),
              col("global_dense_rank").cast("int").as("drnk"),
              col("global_ntile").as("quartile"))

  /** Global top-k: TakeOrderedAndProject, not a full sort. */
  val w6TopKGlobal: Q = (s, d) =>
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))

  /** Per-group top-k via row_number. */
  val w7TopKGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
              round(col("c_acctbal"), 2).as("acctbal"))
  }

  /** first_value / last_value over a full-partition frame. */
  val w8FirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_orderpriority"),
              first(col("o_orderkey")).over(w).as("first_key"),
              last(col("o_orderkey")).over(w).as("last_key"))
      .distinct()
  }

  /** UNION ALL keeps duplicates. */
  val s1UnionAll: Q = (s, d) => {
    val a = orders(s, d).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey"))
    val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    a.union(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
  }

  /** UNION (distinct) of two key sets. */
  val s2UnionDistinct: Q = (s, d) => {
    val a = orders(s, d).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("k"))
    val b = customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k"))
    a.union(b).distinct()
  }

  val s3Intersect: Q = (s, d) => {
    val a = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("k"))
    val b = orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("k"))
    a.intersect(b)
  }

  val s4Except: Q = (s, d) => {
    val a = customer(s, d).select(col("c_custkey").as("k"))
    val b = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    a.except(b)
  }

  val s5Distinct: Q = (s, d) =>
    orders(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()

  /** INTERSECT ALL — multiplicity-preserving intersection (each key
    * appears min(count_a, count_b) times); aggregated so the oracle
    * checks the multiplicities, not just membership.
    */
  val s6IntersectAll: Q = (s, d) => {
    val a = orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("k"))
    val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
  }

  /** EXCEPT ALL — multiplicity-preserving difference (each key appears
    * max(count_a - count_b, 0) times).
    */
  val s7ExceptAll: Q = (s, d) => {
    val a = orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("k"))
    val b = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
  }

  /** Distribution window functions: percent_rank / cume_dist (unique
    * total order inside each partition → deterministic doubles; the
    * division of identical ints is IEEE-identical across engines).
    */
  val w9RankDistribution: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_orderkey") % 25 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
              round(percent_rank().over(w), 8).as("pct_rank"),
              round(cume_dist().over(w), 8).as("cume"))
  }

  /** IGNORE NULLS window functions — the FORWARD-FILL (gap-fill)
    * idiom a sensor/event pipeline runs over sparse readings: plant
    * deterministic nulls (every 3rd event's value), then per user in
    * time order take the previous non-null (`lag … IGNORE NULLS`) and
    * the running last non-null (`last_value … IGNORE NULLS` over an
    * unbounded-preceding frame — the fill itself). Counts pin the
    * null-skipping semantics; the filled sum goes through the exact
    * decimal path. Per-user windows → per-group sorts, horizontal
    * scale like every other w-query.
    */
  val w10FillForward: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("v",
        when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
      .withColumn("prev_v", lag(col("v"), 1, null, ignoreNulls = true).over(w))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(wf))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           count(col("prev_v")).as("n_prev"),
           count(col("filled")).as("n_filled"),
           moneySum(col("filled")).as("sum_filled"))
  }

  /** MATCH_RECOGNIZE-style event-pattern matching (complex event
    * processing) without a CEP engine: each user's event history
    * collapses to ONE ordered symbol string (s=signup, v=view,
    * c=click, p=purchase, e=error) and the funnel "signup, then
    * anything but a purchase, then the first purchase" is the regex
    * `s[^p]*p` counted non-overlapping. The greedy `[^p]*` cannot
    * backtrack ambiguously — every match runs from an `s` to the
    * FIRST following `p` — so the match count is engine-independent
    * (java.util.regex and RE2 agree), unlike a general greedy pattern.
    *
    * Scale shape: one exchange on user_id builds the per-user string
    * (collect_list + array_sort — order is (ts, event_id), total per
    * group, no global sort); the regex scan is map-side over the
    * aggregated row. Sequence length is bounded by per-user activity;
    * at 100 TB you'd sessionize first (wb3's session windows) so no
    * single group's string grows with corpus age, then run the same
    * pattern per session.
    */
  val w11EventPattern: Q = (s, d) => {
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("""CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
               | WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
               | ELSE 'e' END""".stripMargin).as("c"))
      .groupBy(col("user_id"))
      .agg(concat_ws("",
        expr("transform(array_sort(collect_list(struct(ts, event_id, c)))," +
             " x -> x.c)")).as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        size(expr("regexp_extract_all(seq, 's[^p]*p', 0)")).cast("long")
          .as("n_funnels"),
        (length(col("seq")) - length(regexp_replace(col("seq"), "p", "")))
          .cast("long").as("n_purchases"))
  }

  /** Time-interval RANGE frame: each event's trailing-hour activity
    * (count + admitted micros-sum of `value`) per user — the moving
    * aggregate a RANGE frame exists for, where ROWS frames are wrong
    * the moment event spacing is irregular. The frame is keyed on
    * epoch-micros (both engines order and bound the frame on the same
    * int64, and RANGE includes ts-ties as peers identically). Rolled
    * up per event type: total events, burst events (≥3 in the trailing
    * hour), max burst, and the decimal-exact sum of the moving counts.
    * Scale: one exchange on user_id; the frame scan is the
    * per-partition sliding-window pass.
    */
  val w12RangeFrame: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("mc", count(lit(1)).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("mc") >= 3, 1L).otherwise(0L)).as("n_burst"),
           max(col("mc")).as("max_burst"),
           sum(col("mc")).as("sum_mc"))
  }

  val queries: Map[String, Q] = Map(
    "w12_range_frame" -> w12RangeFrame,
    "w10_fill_forward" -> w10FillForward,
    "w11_event_pattern" -> w11EventPattern,
    "w1_rank" -> w1Rank,
    "w2_lag_lead" -> w2LagLead,
    "w3_running_sum" -> w3Running,
    "w4_range_frame" -> w4RangeFrame,
    "w5_ntile_dense" -> w5NtileDense,
    "w6_topk_global" -> w6TopKGlobal,
    "w7_topk_group" -> w7TopKGroup,
    "w8_first_last" -> w8FirstLast,
    "s1_union_all" -> s1UnionAll,
    "s2_union_distinct" -> s2UnionDistinct,
    "s3_intersect" -> s3Intersect,
    "s4_except" -> s4Except,
    "s5_distinct" -> s5Distinct,
    "s6_intersect_all" -> s6IntersectAll,
    "s7_except_all" -> s7ExceptAll,
    "w9_rank_distribution" -> w9RankDistribution,
  )

  val oracles: Map[String, String] = Map(
    // the same int64-keyed RANGE frame (ties are peers on both engines)
    "w12_range_frame" ->
      """WITH m AS (SELECT event_type,
        |    count(1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS mc
        |  FROM events)
        |SELECT event_type, count(1) AS n_events,
        |  CAST(sum(CASE WHEN mc >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_burst,
        |  max(mc) AS max_burst, CAST(sum(mc) AS BIGINT) AS sum_mc
        |FROM m GROUP BY event_type""".stripMargin,
    "w11_event_pattern" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
        |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |      ELSE 'e' END AS c
        |  FROM events),
        |seqs AS (
        |  SELECT user_id, string_agg(c, '' ORDER BY ts, event_id) AS seq
        |  FROM e GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 's[^p]*p')) AS BIGINT)
        |    AS n_funnels,
        |  CAST(length(seq) - length(replace(seq, 'p', '')) AS BIGINT)
        |    AS n_purchases
        |FROM seqs""".stripMargin,
    "w10_fill_forward" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, ts,
         |         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
         |  FROM events),
         |w AS (
         |  SELECT user_id,
         |    lag(v IGNORE NULLS) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
         |    last_value(v IGNORE NULLS) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |  FROM e)
         |SELECT user_id, count(1) AS n_events,
         |  CAST(count(prev_v) AS BIGINT) AS n_prev,
         |  CAST(count(filled) AS BIGINT) AS n_filled,
         |  ${sqlMoneySum("filled")} AS sum_filled
         |FROM w GROUP BY user_id""".stripMargin,
    "w9_rank_distribution" ->
      """SELECT o_orderkey, o_orderpriority,
        | round(percent_rank() OVER w, 8) AS pct_rank,
        | round(cume_dist() OVER w, 8) AS cume
        |FROM orders WHERE o_orderkey % 25 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "w1_rank" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rnk
        |FROM (SELECT *, rank() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders)
        |WHERE rnk <= 3""".stripMargin,
    "w2_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(prev_price AS DECIMAL(18,2)) AS DOUBLE) AS price_delta,
        | next_key
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        lag(o_totalprice, 1) OVER w AS prev_price,
        |        lead(o_orderkey, 1) OVER w AS next_key
        |      FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE prev_price IS NOT NULL""".stripMargin,
    "w3_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_quantity ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,
    "w4_range_frame" ->
      """SELECT user_id, event_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts_ms
        |   RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value
        |FROM (SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events)""".stripMargin,
    "w5_ntile_dense" ->
      """SELECT c_custkey,
        | dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |FROM customer WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "w6_topk_global" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "w7_topk_group" ->
      """SELECT c_mktsegment, rn, c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |        ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer)
        |WHERE rn <= 2""".stripMargin,
    "w8_first_last" ->
      """SELECT DISTINCT o_orderpriority,
        | first_value(o_orderkey) OVER w AS first_key,
        | last_value(o_orderkey) OVER w AS last_key
        |FROM orders WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "s1_union_all" ->
      """SELECT o_custkey, count(1) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) GROUP BY o_custkey""".stripMargin,
    "s2_union_distinct" ->
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
        |UNION
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000""".stripMargin,
    "s3_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000""".stripMargin,
    "s4_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "s5_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "s6_intersect_all" ->
      """SELECT k, count(1) AS n FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |) GROUP BY k""".stripMargin,
    "s7_except_all" ->
      """SELECT k, count(1) AS n FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY k""".stripMargin,
  )
}
