package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.sources.Num._

/** Batch analogs of the streaming window operators (SURVEY.md §2.11 /
  * M3): tumbling window(), sliding window(), session_window(), and
  * dropDuplicates — the exact expressions graft.streaming.Streams runs
  * under a watermark, here verified against plain-SQL oracles
  * (session windows via gaps-and-islands).
  *
  * Window starts are surfaced as epoch seconds (bigint) — timestamp
  * columns don't hash identically across engines (µs vs ns).
  */
object WindowsBatch {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows per event type. */
  val wb1Tumbling: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
              col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes (each event in 4 windows). */
  val wb2Sliding: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_windows"), sum(col("n")).as("n_events_x4"),
           min(unix_timestamp(col("w.start"))).as("first_window"))

  /** Session windows: 30-minute inactivity gap per user. Oracle:
    * gaps-and-islands (lag + cumulative gap count).
    */
  val wb3Session: Q = (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           max(col("n")).as("max_session_events"),
           sum(col("n")).as("n_events"))

  /** Batch dropDuplicates == streaming dedup within watermark. */
  val wb4Dedup: Q = (s, d) =>
    events(s, d)
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  /** Conversion funnel: signup → later click → later purchase per
    * user, counting users surviving each stage. Each stage is a
    * key-partitioned aggregate + join (no window over the whole
    * event stream), so the plan is three shuffles on user_id that
    * AQE coalesces — the funnel shape that scales with users, not
    * with events per user.
    */
  val wb5Funnel: Q = (s, d) => {
    val e = graft.sources.Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_s"))
    val cl = e.filter(col("event_type") === "click").join(su, "user_id")
      .filter(col("ts") >= col("t_s"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_c"))
    val pu = e.filter(col("event_type") === "purchase").join(cl, "user_id")
      .filter(col("ts") >= col("t_c"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_p"))
    su.join(cl, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_signup"),
           count(col("t_c")).as("n_signup_click"),
           count(col("t_p")).as("n_full_funnel"))
  }

  /** Batch analog of streaming.TwsQuota (the transformWithState quota
    * enforcer): per (user, tumbling hour) the first `maxPerWindow`=3
    * events by (ts, event_id) admit, the rest are tagged rejected —
    * EXACTLY the decision rule the streaming processor's MapState
    * counter implements, here as one window function so the oracle
    * pins the rule both operators share. Scale: one exchange on
    * (user, window); the per-partition sort is the only extra cost.
    */
  val wb6QuotaAdmission: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("win"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("win", expr("unix_micros(ts) div 3600000000"))
      .withColumn("rn", row_number().over(w))
      .withColumn("admitted", col("rn") <= 3)
      .groupBy(col("event_type"), col("admitted"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           min(col("event_id")).as("min_event"))
  }

  val queries: Map[String, Q] = Map(
    "wb6_quota_admission" -> wb6QuotaAdmission,
    "wb1_tumbling" -> wb1Tumbling,
    "wb2_sliding" -> wb2Sliding,
    "wb3_session" -> wb3Session,
    "wb4_dedup" -> wb4Dedup,
    "wb5_funnel" -> wb5Funnel,
  )

  val oracles: Map[String, String] = Map(
    // the shared quota rule as one window computation
    "wb6_quota_admission" ->
      """WITH r AS (SELECT event_type, user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id, epoch_ms(ts) // 3600000
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_type, rn <= 3 AS admitted, count(1) AS n_events,
        |  count(DISTINCT user_id) AS n_users, min(event_id) AS min_event
        |FROM r GROUP BY 1, 2""".stripMargin,
    "wb5_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS t_s FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |cl AS (SELECT e.user_id, min(ts) AS t_c FROM events e JOIN su USING (user_id)
        |       WHERE event_type = 'click' AND ts >= t_s GROUP BY 1),
        |pu AS (SELECT e.user_id, min(ts) AS t_p FROM events e JOIN cl USING (user_id)
        |       WHERE event_type = 'purchase' AND ts >= t_c GROUP BY 1)
        |SELECT count(1) AS n_signup, count(t_c) AS n_signup_click,
        |       count(t_p) AS n_full_funnel
        |FROM su LEFT JOIN cl USING (user_id) LEFT JOIN pu USING (user_id)""".stripMargin,
    "wb1_tumbling" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
         | event_type, count(1) AS n, ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "wb2_sliding" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_ms(ts) // 900000) * 900 - k.k AS window_start
        |  FROM events, (SELECT unnest([0, 900, 1800, 2700]) AS k) k),
        |w AS (SELECT user_id, window_start, count(1) AS n FROM e GROUP BY 1, 2)
        |SELECT user_id, count(1) AS n_windows, CAST(sum(n) AS BIGINT) AS n_events_x4,
        |       min(window_start) AS first_window
        |FROM w GROUP BY user_id""".stripMargin,
    "wb3_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    -- Spark session [start, last+gap): an event exactly at
        |    -- prev+gap starts a NEW session, hence >= not >
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM o),
        |g AS (SELECT user_id, session_id, count(1) AS n FROM s GROUP BY 1, 2)
        |SELECT user_id, count(1) AS n_sessions, max(n) AS max_session_events,
        |       CAST(sum(n) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "wb4_dedup" ->
      """SELECT event_type, count(1) AS n_users
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type""".stripMargin,
  )
}
