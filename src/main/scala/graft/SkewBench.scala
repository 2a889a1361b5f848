package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join demonstration at ~sf1 row counts: one hot key holds 90%
  * of a multi-million-row fact side, joined against a 1k-row dim with
  * broadcast disabled (forcing the shuffle join a 100 TB fact⋈fact
  * would take — at real scale the dim wouldn't broadcast either).
  *
  * Three executions of the same join, timed:
  *   aqe_skew_on   — AQE OptimizeSkewedJoin splits the hot partition
  *                   into advisory-sized chunks at runtime (asserted
  *                   via isSkewJoin in the final adaptive plan);
  *   aqe_skew_off  — the degenerate baseline: every row of the hot key
  *                   lands on ONE reducer, wall-time ≈ that one task;
  *   salted        — the manual plan-time recipe (Scale.saltedJoin):
  *                   fact salt + dim replication, skew-immune without
  *                   runtime re-planning.
  *
  * The skew thresholds are scaled to this corpus the same way a 100 TB
  * deployment scales them to executors (threshold ≪ hot-partition
  * bytes, advisory ≈ healthy-partition bytes); Spark's defaults target
  * 256 MB partitions, ~40× this corpus's healthy-partition size.
  *
  * Prints one JSON line; recorded in ROUND5_NOTES.md. ScaleSpec pins
  * the structural claims (isSkewJoin marking, salted ≡ plain results)
  * so this main is measurement, not the correctness gate.
  */
object SkewBench {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def skewedFact(spark: SparkSession, n: Long): DataFrame =
    // 90% of rows carry key 42; the rest spread over 1000 keys
    spark.range(n).select(
      when(col("id") % 10 =!= 0, lit(42L))
        .otherwise(col("id") % 1000).as("k"),
      (col("id") * 7 % 1000003).as("v"))

  def dim(spark: SparkSession): DataFrame =
    spark.range(1000).select(col("id").as("k2"),
      concat(lit("dim_"), col("id")).as("name"))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warmup

    def run(skewOn: Boolean): (Double, String) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val j = skewedFact(spark, n).join(dim(spark), col("k") === col("k2"))
        .groupBy(col("name")).agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      val sec = time { j.queryExecution.toRdd.count(); () }
      (sec, j.queryExecution.executedPlan.toString)
    }
    val (tOff, _) = run(skewOn = false)
    val (tOn, planOn) = run(skewOn = true)
    val skewMarked = planOn.contains("isSkewJoin=true") || planOn.contains("skew=true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val tSalted = time {
      graft.operators.Scale
        .saltedJoin(skewedFact(spark, n), dim(spark),
                    col("k"), col("k2"), nSalts = 32)
        .groupBy(col("name")).agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
        .queryExecution.toRdd.count()
      ()
    }
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(
      s"""{"metric":"skew_join_sec","rows":$n,"aqe_skew_off":${fmt(tOff)},""" +
      s""""aqe_skew_on":${fmt(tOn)},"salted":${fmt(tSalted)},""" +
      s""""skew_marked":$skewMarked}""")
    spark.stop()
  }
}
