package graft


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
    val spark = GenSession.local()
    ScaleCurve.genScaled(spark, s"$base/sf0.1", out, 10)
    ScaleCurve.genTpchScaled(spark, s"$base/sf0.1", out, 10)
    println(s"sf1 full gate corpus ready at $out")
    spark.stop()
  }
}
