package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.sources.Num._

/** Core relational operator inventory (SURVEY.md §2.12): scans,
  * projections, filters, the full join matrix, and grouped aggregation.
  *
  * Design for scale (100 TB): every query is declarative DataFrame DSL so
  * Catalyst applies pushdown/pruning; small dimension tables are
  * explicitly `broadcast()`; fact-fact joins shuffle on their natural
  * keys and rely on AQE for skew/coalescing. No RDDs, no UDFs, no
  * collect() — all plans survive a 1000-executor scale-up unchanged.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: pricing summary over lineitem (flagship query).
    * One shuffle (partial+final hash agg via Catalyst); filter and
    * 7-column projection pushed into the parquet scan.
    */
  val q1PricingSummary: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        prodSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6 shape: scan-heavy filter + scalar aggregate. At scale this
    * is pure pushdown: 4 columns read, all predicates in PushedFilters.
    */
  val q2FilterAgg: Q = (s, d) =>
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.04, 0.07) && col("l_quantity") < 24)
      .agg(prodSum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n"))

  /** Projection + filter returning raw rows (narrow date slice). */
  val q3Project: Q = (s, d) =>
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-02-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"), 4)
          .as("net_price"))

  /** Broadcast-hash join chain: customer ⋈ nation ⋈ region (dims tiny →
    * broadcast; zero shuffle for the joins, one for the final agg).
    */
  val q4JoinBroadcast: Q = (s, d) =>
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_acctbal"))

  /** Fact-fact shuffle join: orders ⋈ lineitem on orderkey. At 100 TB
    * both sides shuffle-partition on the join key (or are bucketed on
    * it); Catalyst picks sort-merge, AQE handles skew.
    */
  val q5JoinFacts: Q = (s, d) =>
    orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(prodSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))

  /** TPC-H Q5 shape: multi-way join, dims broadcast, facts shuffled. */
  val q6JoinMulti: Q = (s, d) =>
    customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
            col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(prodSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

  /** Left-semi join (EXISTS): customers that placed a high-value order. */
  val q7JoinSemi: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 50000).select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Left-anti join (NOT EXISTS): customers with no urgent order
    * (all-orders anti is empty in this data — keep it non-trivial).
    */
  val q8JoinAnti: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_acctbal"))

  /** Left-outer join preserving customers without orders. */
  val q9JoinOuter: Q = (s, d) =>
    customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      .join(orders(s, d).select(col("o_custkey"), col("o_totalprice")),
            col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("o_totalprice")).as("n_orders"),
           sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("n_childless"))

  /** Full-outer join: customer-count vs supplier-count per nationkey
    * (suppliers cover few nations → nulls on both sides possible).
    */
  val q10JoinFullOuter: Q = (s, d) => {
    val c = customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_customers"))
    val p = supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(p, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** Cross join of two tiny dimensions (explicit cartesian). */
  val q11JoinCross: Q = (s, d) =>
    region(s, d).select(col("r_name"))
      .crossJoin(nation(s, d).select(col("n_name")))
      .select(col("r_name"), col("n_name"))

  /** Range (theta) join: same-user event pairs within 5 minutes.
    * Bucketed: each probe row fans out to its own 5-minute bucket and
    * the next, so the equi-join key is (user, bucket) and only
    * adjacent-bucket rows ever meet the interval predicate. Turns the
    * per-user quadratic blow-up (667² pairs/user at sf0.1) into a few
    * rows per bucket — the plan shape that survives 100 TB.
    */
  val q12JoinRange: Q = (s, d) => {
    val bucketed = events(s, d)
      .withColumn("bucket", expr("unix_micros(ts) div 300000000"))
    val a = bucketed.select(
      col("event_id").as("a_id"), col("user_id").as("a_user"),
      col("ts").as("a_ts"), col("event_type").as("a_type"),
      explode(array(col("bucket"), col("bucket") + 1)).as("a_bucket"))
    val b = bucketed.select(
      col("event_id").as("b_id"), col("user_id").as("b_user"),
      col("ts").as("b_ts"), col("event_type").as("b_type"),
      col("bucket").as("b_bucket"))
    a.join(b,
        col("a_user") === col("b_user") &&
        col("a_bucket") === col("b_bucket") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** KEYLESS interval join via time-bin bucketing — the scale path
    * when a range join has NO equi-key at all (q12 still hashes on
    * user; here the only join dimension is time). Every signup opens a
    * 1-hour window (lo, hi]; events match by falling inside it. The
    * bin trick: intervals explode into the ≤2 hour-bins they overlap,
    * points map to exactly ONE bin, so every true pair meets in the
    * point's bin precisely once (no dedup pass needed) and the join is
    * a plain hash join on the bin — interval replication is bounded by
    * ceil(width/bin)+1, no broadcast, no nested loop, and a hot bin
    * salts like any hot hash key.
    */
  val q24IntervalJoin: Q = (s, d) => {
    val binUs = 3600000000L // bin width == interval width (1 hour)
    val ev = events(s, d).withColumn("tsm", expr("unix_micros(ts)"))
    val iv = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("iv_id"), col("tsm").as("lo"),
              (col("tsm") + binUs).as("hi"))
      .withColumn("bin",
        explode(sequence(expr(s"lo div ${binUs}L"), expr(s"hi div ${binUs}L"))))
    val pts = ev.select(col("event_id"), col("event_type"), col("tsm"))
      .withColumn("bin", expr(s"tsm div ${binUs}L"))
    iv.join(pts, "bin")
      .filter(col("tsm") > col("lo") && col("tsm") <= col("hi"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("event_id")).as("n_events"),
           countDistinct(col("iv_id")).as("n_windows"))
  }

  /** As-of join: for each purchase, the most recent prior signup by
    * the same user. Union-then-window instead of join-then-argmax: ONE
    * shuffle on user_id and zero pair expansion (the join form builds
    * |purchases|×|prior signups| intermediates — measured 5s at sf0.1
    * where this runs in under a second, and the gap widens with
    * events-per-user). Signups sort before purchases at equal ts,
    * implementing the inclusive s_ts <= p_ts bound.
    */
  val q13JoinAsOf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
               when(col("event_type") === "signup", 0).otherwise(1),
               col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_signup_id",
        last(when(col("event_type") === "signup", col("event_id")),
             ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("asof_signup_id").isNotNull)
      .select(col("event_id").as("p_id"), col("asof_signup_id"))
  }

  /** Grouped aggregation battery: count/min/max/sum/avg per group. */
  val q14AggStats: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        moneySum(col("o_totalprice")).as("sum_price"),
        moneyAvg(col("o_totalprice")).as("avg_price"))

  /** Exact distinct-count (expand + two-phase agg in Catalyst). */
  val q15CountDistinct: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
           count(lit(1)).as("n_orders"))

  /** ROLLUP hierarchy: region → nation subtotals + grand total. */
  val q16Rollup: Q = (s, d) =>
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))

  /** CUBE over lineitem flags. */
  val q17Cube: Q = (s, d) =>
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))

  /** GROUPING SETS (explicit sets, not the rollup/cube shorthand). */
  val q18GroupingSets: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Same as-of semantics as q13, through the NATIVE operator
    * (graft.plans.AsOf → custom LogicalPlan/Rule/Strategy/Exec):
    * purchases matched to the latest signup at-or-before them per
    * user. Unlike q13's union+window (one shuffle + one big sort over
    * BOTH event types together), the native plan co-partitions the two
    * filtered sides, sorts each independently, and streams a
    * per-partition merge with O(1) state.
    */
  val q19AsOfNative: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    graft.plans.AsOf.join(
        purchases, signups,
        leftOn = Seq("user_id"), rightOn = Seq("s_user"),
        leftTimeCol = "ts", rightTimeCol = "s_ts",
        rightTieBreakCols = Seq("s_id"))
      .select(col("p_id"), col("s_id").as("asof_signup_id"))
  }

  /** Left-outer variant of the native as-of join: purchases with no
    * preceding signup survive with a null attribution.
    */
  val q20AsOfOuter: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    graft.plans.AsOf.join(
        purchases, signups,
        leftOn = Seq("user_id"), rightOn = Seq("s_user"),
        leftTimeCol = "ts", rightTimeCol = "s_ts",
        rightTieBreakCols = Seq("s_id"), joinType = "left_outer")
      .select(col("p_id"), col("s_id").as("asof_signup_id"))
  }

  /** Forward as-of through the native operator: each purchase matched
    * to the EARLIEST signup at-or-after it per user (ties: smallest
    * signup id) — the "next event" direction of the same merge.
    */
  val q21AsOfForward: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    graft.plans.AsOf.join(
        purchases, signups,
        leftOn = Seq("user_id"), rightOn = Seq("s_user"),
        leftTimeCol = "ts", rightTimeCol = "s_ts",
        rightTieBreakCols = Seq("s_id"), direction = "forward")
      .select(col("p_id"), col("s_id").as("next_signup_id"))
  }

  /** Tolerance-bounded as-of: attribution only when the signup is
    * within 1 hour BEFORE the purchase (stale matches nulled out by
    * the operator, not a post-filter).
    */
  val q22AsOfTolerance: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    graft.plans.AsOf.join(
        purchases, signups,
        leftOn = Seq("user_id"), rightOn = Seq("s_user"),
        leftTimeCol = "ts", rightTimeCol = "s_ts",
        rightTieBreakCols = Seq("s_id"),
        toleranceMicros = 3600L * 1000000L)
      .select(col("p_id"), col("s_id").as("asof_signup_id"))
  }

  /** Nearest-direction as-of with a ±30-minute tolerance: each
    * purchase takes the closer of its latest-preceding and
    * earliest-following signup (ties to the preceding one).
    */
  val q23AsOfNearest: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    graft.plans.AsOf.join(
        purchases, signups,
        leftOn = Seq("user_id"), rightOn = Seq("s_user"),
        leftTimeCol = "ts", rightTimeCol = "s_ts",
        rightTieBreakCols = Seq("s_id"), direction = "nearest",
        toleranceMicros = 1800L * 1000000L)
      .select(col("p_id"), col("s_id").as("nearest_signup_id"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of silently dropping — the semantics a
    * plain equi-join gets wrong when the join key is derived and
    * partially null (here: a sentinel bucket nulled out on both
    * sides). Catalyst plans `<=>` as a normal hash join — null-safe
    * equality is still an equi-key, so the shuffle/broadcast story is
    * unchanged at 100 TB; the null group hashes like any other value.
    */
  val q25NullSafeJoin: Q = (s, d) => {
    val a = events(s, d)
      .select(expr("nullif(user_id % 10, 7)").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_a"))
    val b = orders(s, d)
      .select(expr("nullif(o_custkey % 10, 7)").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_b"))
    a.join(b, a("k") <=> b("k"))
      .select(a("k").as("k"), col("n_a"), col("n_b"))
  }

  val queries: Map[String, Q] = Map(
    "q25_null_safe_join" -> q25NullSafeJoin,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_filter_agg" -> q2FilterAgg,
    "q3_project" -> q3Project,
    "q4_join_broadcast" -> q4JoinBroadcast,
    "q5_join_facts" -> q5JoinFacts,
    "q6_join_multi" -> q6JoinMulti,
    "q7_join_semi" -> q7JoinSemi,
    "q8_join_anti" -> q8JoinAnti,
    "q9_join_outer" -> q9JoinOuter,
    "q10_join_full_outer" -> q10JoinFullOuter,
    "q11_join_cross" -> q11JoinCross,
    "q12_join_range" -> q12JoinRange,
    "q13_join_asof" -> q13JoinAsOf,
    "q14_agg_stats" -> q14AggStats,
    "q15_count_distinct" -> q15CountDistinct,
    "q16_rollup" -> q16Rollup,
    "q17_cube" -> q17Cube,
    "q18_grouping_sets" -> q18GroupingSets,
    "q19_asof_native" -> q19AsOfNative,
    "q20_asof_outer" -> q20AsOfOuter,
    "q21_asof_forward" -> q21AsOfForward,
    "q22_asof_tolerance" -> q22AsOfTolerance,
    "q23_asof_nearest" -> q23AsOfNearest,
    "q24_interval_join" -> q24IntervalJoin,
  )

  val oracles: Map[String, String] = Map(
    // <=> replayed as IS NOT DISTINCT FROM
    "q25_null_safe_join" ->
      """WITH a AS (SELECT nullif(user_id % 10, 7) AS k, count(1) AS n_a
        |           FROM events GROUP BY 1),
        |b AS (SELECT nullif(o_custkey % 10, 7) AS k, count(1) AS n_b
        |      FROM orders GROUP BY 1)
        |SELECT a.k AS k, n_a, n_b
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlMoneySum("l_quantity")} AS sum_qty,
         | ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
         | ${sqlProdSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         | ${sqlMoneyAvg("l_quantity")} AS avg_qty,
         | ${sqlMoneyAvg("l_extendedprice")} AS avg_price,
         | count(1) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_agg" ->
      s"""SELECT ${sqlProdSum("l_extendedprice * l_discount")} AS revenue, count(1) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)) AS DOUBLE), 4) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'""".stripMargin,
    "q4_join_broadcast" ->
      s"""SELECT r_name, count(1) AS n_customers, ${sqlMoneySum("c_acctbal")} AS sum_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,
    "q5_join_facts" ->
      s"""SELECT o_orderpriority,
         | ${sqlProdSum("l_extendedprice * (1 - l_discount)")} AS revenue, count(1) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "q6_join_multi" ->
      s"""SELECT n_name, ${sqlProdSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,
    "q7_join_semi" ->
      """SELECT c_mktsegment, count(1) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q8_join_anti" ->
      s"""SELECT c_mktsegment, count(1) AS n_customers, ${sqlMoneySum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         |GROUP BY c_mktsegment""".stripMargin,
    "q9_join_outer" ->
      """SELECT c_mktsegment, count(1) AS n_rows, count(o_totalprice) AS n_orders,
        | CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_childless
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q10_join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(1) AS n_customers FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, count(1) AS n_suppliers FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |       coalesce(n_customers, 0) AS n_customers,
        |       coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk""".stripMargin,
    "q11_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q12_join_range" ->
      """SELECT a.event_type AS a_type, b.event_type AS b_type, count(1) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |GROUP BY a.event_type, b.event_type""".stripMargin,
    "q24_interval_join" ->
      """WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS tsm FROM events),
        |iv AS (SELECT event_id AS iv_id, tsm AS lo, tsm + 3600000000 AS hi
        |       FROM ev WHERE event_type = 'signup'),
        |j AS (SELECT iv.iv_id, e.event_id, e.event_type
        |      FROM iv JOIN ev e ON e.tsm > iv.lo AND e.tsm <= iv.hi)
        |SELECT event_type, count(1) AS n_pairs,
        |  count(DISTINCT event_id) AS n_events,
        |  count(DISTINCT iv_id) AS n_windows
        |FROM j GROUP BY event_type""".stripMargin,
    // mirrors the Spark window exactly (incl. the event_id tie-break)
    // — arg_max would pick an arbitrary row among same-ts signups
    "q13_join_asof" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id
        |  FROM e)
        |SELECT event_id AS p_id, asof_signup_id
        |FROM o WHERE event_type = 'purchase' AND asof_signup_id IS NOT NULL""".stripMargin,
    // native operator, same semantics as q13 → same oracle shape
    "q19_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id
        |  FROM e)
        |SELECT event_id AS p_id, asof_signup_id
        |FROM o WHERE event_type = 'purchase' AND asof_signup_id IS NOT NULL""".stripMargin,
    // outer variant: unmatched purchases kept with NULL attribution
    "q20_asof_outer" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id
        |  FROM e)
        |SELECT event_id AS p_id, asof_signup_id
        |FROM o WHERE event_type = 'purchase'""".stripMargin,
    // forward direction: FIRST following signup (purchases sort before
    // same-ts signups, so rt >= lt is inclusive; ties → min event_id)
    "q21_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    first_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_signup_id
        |  FROM e)
        |SELECT event_id AS p_id, next_signup_id
        |FROM o WHERE event_type = 'purchase' AND next_signup_id IS NOT NULL""".stripMargin,
    // tolerance: the matched signup's ts rides the same window, so the
    // bound filters the SAME row the operator matched
    "q22_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER w AS asof_signup_id,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER w AS asof_signup_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id
        |     ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS p_id, asof_signup_id
        |FROM o WHERE event_type = 'purchase' AND asof_signup_id IS NOT NULL
        |  AND ts - asof_signup_ts <= INTERVAL 1 HOUR""".stripMargin,
    // nearest: backward candidate from the preceding window, forward
    // from the following window; smaller gap wins, ties → backward
    "q23_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type FROM events
        |           WHERE event_type IN ('purchase', 'signup')),
        |o AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER wb AS b_id,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER wb AS b_ts,
        |    first_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER wf AS f_id,
        |    first_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER wf AS f_ts
        |  FROM e
        |  WINDOW
        |    wb AS (PARTITION BY user_id
        |      ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id
        |      ORDER BY ts, CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |c AS (SELECT event_id, ts, b_id, b_ts, f_id, f_ts,
        |    (b_id IS NOT NULL AND ts - b_ts <= INTERVAL 30 MINUTE) AS b_ok,
        |    (f_id IS NOT NULL AND f_ts - ts <= INTERVAL 30 MINUTE) AS f_ok
        |  FROM o WHERE event_type = 'purchase')
        |SELECT event_id AS p_id,
        |  CASE WHEN b_ok AND (NOT f_ok OR ts - b_ts <= f_ts - ts) THEN b_id
        |       ELSE f_id END AS nearest_signup_id
        |FROM c WHERE b_ok OR f_ok""".stripMargin,
    "q14_agg_stats" ->
      s"""SELECT o_orderpriority, count(1) AS n_orders,
         | round(min(o_totalprice), 2) AS min_price,
         | round(max(o_totalprice), 2) AS max_price,
         | ${sqlMoneySum("o_totalprice")} AS sum_price,
         | ${sqlMoneyAvg("o_totalprice")} AS avg_price
         |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q15_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs, count(1) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q16_rollup" ->
      """SELECT r_name, n_name, count(1) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q17_cube" ->
      s"""SELECT l_returnflag, l_linestatus, ${sqlMoneySum("l_quantity")} AS sum_qty, count(1) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q18_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
  )
}
