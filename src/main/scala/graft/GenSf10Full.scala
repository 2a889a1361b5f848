package graft


/** Completes the sf10 gate corpus with FK-consistent TPC-H replicas
  * (100 disjoint copies of sf0.1 — lineitem ~60M rows), so the
  * HEAVIEST x/c queries can join the sf10 exact gate alongside the
  * d/t/n/g slice (r9 verdict, next-round #6: the top x/c bench
  * residents were gated only to ~sf1). Same dir as GenSf10Gate's
  * documents/events/embeddings; `graft.Verify <dir>` +
  * `tools/gate_isolated.py --merge` then extend CORRECTNESS_SF10.json.
  */
object GenSf10Full {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
      "/root/repo/target/scalecurve/sf10")
    val spark = GenSession.local()
    ScaleCurve.genTpchScaled(spark, s"$base/sf0.1", out, 100)
    println(s"sf10 TPC-H replica ready at $out")
    spark.stop()
  }
}
