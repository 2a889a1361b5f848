package graft

/** Completes the sf30 corpus (300× sf0.1 — 1.5M docs) with the
  * documents table, so the top of the gate ladder gains a rung the
  * perf curve already measures but the oracle never checked: the
  * three heaviest sf10-gated queries (d8 prefix-filter join, d22
  * best-match report, t14 corpus pipeline — each reads documents
  * only) get value-exact verdicts at 3× the previous correctness
  * ceiling. The rest of the surface stays gated at sf10: DuckDB-side
  * cost is the binding constraint (the deep curve runs to sf100 for
  * that reason), and these three are exactly the queries whose
  * exponents sit near 1.0 and therefore deserve the extra rung.
  *
  *   sbt "runMain graft.GenSf30Gate"
  *   SPARK_GRAFT_ONLY=d8_prefix_join,d22_best_match,t14_corpus_pipeline \
  *     SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt "runMain graft.Verify target/scalecurve/sf30 /tmp/verify_sf30"
  *   python3 tools/gate_isolated.py target/scalecurve/sf30 \
  *     /tmp/verify_sf30 CORRECTNESS_SF30.json 3600
  */
object GenSf30Gate {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF30_DIR",
      "/root/repo/target/scalecurve/sf30")
    val spark = GenSession.local()
    ScaleCurve.genScaled(spark, s"$base/sf0.1", out, 300, Set("documents"))
    println(s"sf30 gate corpus ready at $out")
    spark.stop()
  }
}
