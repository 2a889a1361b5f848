package graft

/** Completes the sf100 corpus (1000× sf0.1) beyond the embeddings
  * GenDeepEmb already wrote there: documents (5M docs), events (100M
  * rows) and FK-consistent TPC-H replicas (lineitem ~600M rows) — a
  * fourth full-corpus gate rung at 3.3× the sf30 ceiling, for the
  * queries whose sf30 oracles were comfortable and whose deep curves
  * already measure sf100 (q24 interval join, x22 TPC-H q21, x23
  * TPC-H q2, t14 corpus pipeline). DuckDB-side oracle cost is the
  * binding constraint, as at every rung: gate the cheap-oracle
  * linear queries here, leave the heavy-oracle family gated at sf30.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.GenSf100Full"
  *   SPARK_GRAFT_ONLY=q24_interval_join,x22_tpch_q21,x23_tpch_q2,t14_corpus_pipeline \
  *     SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt "runMain graft.Verify target/scalecurve/sf100 /tmp/verify_sf100"
  *   python3 tools/gate_isolated.py target/scalecurve/sf100 \
  *     /tmp/verify_sf100 CORRECTNESS_SF100.json 7200
  */
object GenSf100Full {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR",
      "/root/repo/target/scalecurve/sf100")
    val spark = GenSession.local()
    ScaleCurve.genScaled(spark, s"$base/sf0.1", out, 1000, Set("documents"))
    ScaleCurve.genEvents(spark, s"$base/sf0.1", out, 1000)
    ScaleCurve.genTpchScaled(spark, s"$base/sf0.1", out, 1000)
    println(s"sf100 full corpus (documents + events + TPC-H) ready at $out")
    spark.stop()
  }
}
