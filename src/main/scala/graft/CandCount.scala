package graft

import org.apache.spark.sql.SparkSession

/** Timer-free scale evidence for the d8 prefix filter: the DISTINCT
  * candidate-pair count at a corpus dir. Wall-clock on a saturated
  * single box bends with memory-hierarchy contention long before the
  * plan does anything wrong; the candidate count is the quantity the
  * sub-quadratic claim is actually about, and it cannot be perturbed
  * by the host. Extends SCALECURVE.json's d8_candidates series beyond
  * the shallow scales.
  *
  * Usage: runMain graft.CandCount <sfDir>
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
              "1024")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val b = graft.operators.Dedup.d8Build(spark, dir)
    val docs = graft.sources.Tables.table(spark, dir, "documents").count()
    val c = graft.operators.Dedup.d8Candidates(b._1, b._3).count()
    println(s"""CAND_JSON {"sf":"$dir","n":$docs,"candidates":$c}""")
    spark.stop()
  }
}
