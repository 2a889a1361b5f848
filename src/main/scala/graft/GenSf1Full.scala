package graft

import org.apache.spark.sql.SparkSession

/** Completes the ScaleCurve ~sf1 corpus into a FULL gate directory:
  * documents/embeddings/events from the structure-preserving
  * replicator plus FK-consistent TPC-H tables, all in the same dir —
  * then `graft.Verify <dir> <out>` + `tools/check.py <dir> <out>`
  * replays the entire 151-query oracle surface at 10× the driver's
  * bench scale (the sf1 gate run VERDICT r4 #3 asked for).
  */
object GenSf1Full {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/target/scalecurve/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ScaleCurve.genScaled(spark, s"$base/sf0.1", out, 10)
    ScaleCurve.genTpchScaled(spark, s"$base/sf0.1", out, 10)
    println(s"sf1 full gate corpus ready at $out")
    spark.stop()
  }
}
