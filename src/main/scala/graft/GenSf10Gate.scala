package graft


/** Completes the deep-curve sf10 corpus (100× sf0.1 — 500k docs,
  * generated documents/events-only for the perf series) with the
  * embeddings table, so the HEAVY d/t/n/g slice of the oracle surface
  * can be correctness-gated at sf10 (r8 verdict #3: the exact gate ran
  * at sf0.01 and ~sf1; sf10–sf100 were measured for perf only). The
  * gate itself is then:
  *
  *   SPARK_GRAFT_ONLY=<heavy list> sbt "runMain graft.Verify
  *     /root/repo/target/scalecurve/sf10 /tmp/verify_sf10"
  *   python3 tools/check.py /root/repo/target/scalecurve/sf10 \
  *     /tmp/verify_sf10 CORRECTNESS_SF10.json
  *
  * Replication is the same structure-preserving disjoint scheme the
  * curve corpora use (ScaleCurve scaladoc), so oracle semantics are
  * identical to the driver corpora — DuckDB reads the same files.
  */
object GenSf10Gate {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
      "/root/repo/target/scalecurve/sf10")
    val spark = GenSession.local()
    // documents + events (no-op when the deep curve already built them)
    ScaleCurve.genScaled(spark, s"$base/sf0.1", out, 100,
      Set("documents", "events"))
    // embeddings: the deep corpus skipped them (documents/events-only);
    // genScaled's _GEN_DONE marker predates them, so generate directly.
    // The skip check wants BOTH the committer _SUCCESS inside the table
    // (a crashed overwrite leaves a partial dir) AND the scheme-version
    // marker (a pre-r10 corpus has bit-identical copy vectors — exactly
    // the degenerate data the current scheme exists to avoid).
    if (!ScaleCurve.embeddingsCurrent(out))
      ScaleCurve.genEmbeddings(spark, s"$base/sf0.1", out, 100)
    println(s"sf10 gate corpus ready at $out")
    spark.stop()
  }
}
