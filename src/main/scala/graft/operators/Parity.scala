package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables._

/** Relational expressions of the reference's core dataflow semantics
  * (SURVEY.md §2), phrased over the `events` table as a stand-in Kafka
  * topic: partition = user_id % 4, offset = event_id.
  *
  * The real Kafka-facing pipeline (offset planner, dumper, reloader,
  * state) lives in graft.pipeline; these queries pin the SEMANTICS to a
  * DuckDB oracle so the math is independently checked.
  */
object Parity {
  type Q = (SparkSession, String) => DataFrame

  private def topic(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      (col("user_id") % 4).as("partition"),
      col("event_id").as("offset"),
      col("event_type"), col("value"), col("ts"), col("props"))

  /** S4/O2 tail-N: per-partition LIMIT ceil(N/P) from the end — the
    * reference's core "query" (kafka_client.py:144-156). NOT a global
    * top-N: each partition contributes at most ceil(N/P) rows.
    */
  val p1TailN: Q = (s, d) => {
    val n = 999
    val w = Window.partitionBy(col("partition")).orderBy(col("offset").desc)
    topic(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ceil(lit(n) / lit(4)).cast(LongType))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n_msgs"),
           min(col("offset")).as("start_offset"),
           max(col("offset")).as("end_offset"))
  }

  /** S4 offset arithmetic itself: target = max(begin, end - ceil(N/P)),
    * available = end - target (kafka_client.py:144-156), relationally.
    */
  val p2OffsetPlan: Q = (s, d) => {
    val n = 999
    topic(s, d)
      .groupBy(col("partition"))
      .agg(min(col("offset")).as("begin_offset"),
           (max(col("offset")) + 1).as("end_offset"))
      .select(
        col("partition"), col("begin_offset"), col("end_offset"),
        greatest(col("begin_offset"),
                 col("end_offset") - ceil(lit(n) / lit(4)).cast(LongType))
          .as("target_offset"))
      .withColumn("available", col("end_offset") - col("target_offset"))
  }

  /** A2 arg-max: newest record per key = the state-doc selection
    * (kafka_client.py:343-344), with a deterministic tie-break.
    */
  val p3ArgMax: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("offset").desc)
    topic(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("offset").as("top_offset"),
              round(col("value"), 2).as("top_value"))
  }

  /** K1 deterministic file naming: `{dump_id}-{cumulative:015d}.parquet`
    * (kafka_client.py:242-243) — chunk rows into ≤100-row files in
    * offset order, name by cumulative count, lexicographic sort == scan
    * order invariant. The global row_number here is the RELATIONAL
    * statement of the semantics (single-task window); the production
    * Dumper computes the same names scalably via range partition +
    * per-file footer counts.
    */
  val p4FileNames: Q = (s, d) =>
    topic(s, d)
      .withColumn("rn", row_number().over(Window.orderBy(col("offset"))) - 1)
      .groupBy((col("rn") - (col("rn") % 100)).as("cum_count"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(format_string("dump01-%015d.parquet", col("cum_count")).as("file_name"),
              col("n_msgs"))

  /** A1 lexicographic MAX = latest dump id (kafka_client.py:275). */
  val p5LexMax: Q = (s, d) =>
    documents(s, d)
      .agg(max(col("source")).as("latest_dump_id"),
           max(col("doc_id")).as("max_doc_id"))

  /** P1/K3 key-value projection with str→bytes coercion
    * (kafka_client.py:26-31,172): sizes only, since raw binary columns
    * hash differently across engines.
    */
  val p6KvProject: Q = (s, d) =>
    topic(s, d)
      .select(
        col("partition"),
        octet_length(encode(col("event_type"), "UTF-8")).as("key_bytes"),
        octet_length(encode(col("props"), "UTF-8")).as("value_bytes"))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n"),
           sum(col("key_bytes")).as("sum_key_bytes"),
           sum(col("value_bytes")).as("sum_value_bytes"))

  val queries: Map[String, Q] = Map(
    "p1_tail_n" -> p1TailN,
    "p2_offset_plan" -> p2OffsetPlan,
    "p3_arg_max" -> p3ArgMax,
    "p4_file_names" -> p4FileNames,
    "p5_lex_max" -> p5LexMax,
    "p6_kv_project" -> p6KvProject,
  )

  private val topicSql =
    "SELECT user_id % 4 AS partition, event_id AS off, event_type, value, ts, props FROM events"

  val oracles: Map[String, String] = Map(
    "p1_tail_n" ->
      s"""WITH t AS ($topicSql),
         |r AS (SELECT *, row_number() OVER (PARTITION BY partition ORDER BY off DESC) AS rn FROM t)
         |SELECT partition, count(1) AS n_msgs, min(off) AS start_offset, max(off) AS end_offset
         |FROM r WHERE rn <= CAST(ceil(999.0 / 4) AS BIGINT) GROUP BY partition""".stripMargin,
    "p2_offset_plan" ->
      s"""WITH t AS ($topicSql),
         |b AS (SELECT partition, min(off) AS begin_offset, max(off) + 1 AS end_offset
         |      FROM t GROUP BY partition)
         |SELECT partition, begin_offset, end_offset,
         |  greatest(begin_offset, end_offset - CAST(ceil(999.0 / 4) AS BIGINT)) AS target_offset,
         |  end_offset - greatest(begin_offset, end_offset - CAST(ceil(999.0 / 4) AS BIGINT)) AS available
         |FROM b""".stripMargin,
    "p3_arg_max" ->
      s"""WITH t AS ($topicSql),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, off DESC) AS rn FROM t)
         |SELECT event_type, off AS top_offset, round(value, 2) AS top_value
         |FROM r WHERE rn = 1""".stripMargin,
    "p4_file_names" ->
      s"""WITH t AS ($topicSql),
         |r AS (SELECT row_number() OVER (ORDER BY off) - 1 AS rn FROM t),
         |g AS (SELECT rn - (rn % 100) AS cum_count, count(1) AS n_msgs FROM r GROUP BY 1)
         |SELECT printf('dump01-%015d.parquet', cum_count) AS file_name, n_msgs FROM g""".stripMargin,
    "p5_lex_max" ->
      "SELECT max(source) AS latest_dump_id, max(doc_id) AS max_doc_id FROM documents",
    "p6_kv_project" ->
      s"""WITH t AS ($topicSql)
         |SELECT partition, count(1) AS n,
         | CAST(sum(octet_length(CAST(event_type AS BLOB))) AS BIGINT) AS sum_key_bytes,
         | CAST(sum(octet_length(CAST(props AS BLOB))) AS BIGINT) AS sum_value_bytes
         |FROM t GROUP BY partition""".stripMargin,
  )
}
