package graft

/** Completes the sf30 gate corpus beyond documents/embeddings: events
  * (for q24's interval join) and FK-consistent TPC-H replicas (300
  * disjoint copies of sf0.1 — lineitem ~180M rows, 3× the sf10 full
  * corpus) so the r12 verdict's widened sf30 rung can gate the top
  * sf10 residents (x22/x23/q24) value-exact at 3× the previous
  * correctness ceiling. Same dir as GenSf30Gate's documents; extend
  * CORRECTNESS_SF30.json with `tools/gate_isolated.py --merge`.
  */
object GenSf30Full {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF30_DIR",
      "/root/repo/target/scalecurve/sf30")
    val spark = GenSession.local()
    ScaleCurve.genEvents(spark, s"$base/sf0.1", out, 300)
    ScaleCurve.genTpchScaled(spark, s"$base/sf0.1", out, 300)
    println(s"sf30 full corpus (events + TPC-H) ready at $out")
    spark.stop()
  }
}
