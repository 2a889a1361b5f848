package graft

/** Completes the deep scale-curve corpora (sf30/sf100 — historically
  * documents/events-only, sized for d8/d22/t14) with EMBEDDINGS, so
  * the embedding-assignment family (d23 flat √N codebook vs d25
  * hierarchical ∛N) has measurable points past sf10: the two designs'
  * assignment-stage work ratio is √N/∛N ≈ 2.4 at 200k vectors but
  * ≈ 11 at 2M, so the crossover the d25 scaladoc argues only shows in
  * a decade the sf10 gate cannot reach. Same replication scheme and
  * version marker as every other embeddings rung (ScaleCurve
  * .genEmbeddings — per-copy isometric sign relabeling), so the
  * corpus fingerprint machinery accepts the dirs.
  *
  * Usage: runMain graft.GenDeepEmb [nCopies outDir]...
  * Default: 300 → target/scalecurve/sf30, 1000 → target/scalecurve/sf100.
  */
object GenDeepEmb {
  def main(args: Array[String]): Unit = {
    val spark = GenSession.local()
    val src = "/root/testdata/sf0.1"
    // loud usage errors instead of IndexOutOfBounds / NumberFormat on
    // an odd arg count or swapped pair order (r12 advice)
    require(args.length % 2 == 0,
      s"usage: runMain graft.GenDeepEmb [nCopies outDir]... — got " +
        s"${args.length} args (odd count)")
    val targets: Seq[(Int, String)] =
      if (args.isEmpty)
        Seq(300 -> "/root/repo/target/scalecurve/sf30",
            1000 -> "/root/repo/target/scalecurve/sf100")
      else args.grouped(2).map { a =>
        require(a(0).forall(_.isDigit),
          s"usage: runMain graft.GenDeepEmb [nCopies outDir]... — " +
            s"'${a(0)}' is not a copy count (swapped args?)")
        a(0).toInt -> a(1)
      }.toSeq
    targets.foreach { case (n, out) =>
      if (ScaleCurve.embeddingsCurrent(out))
        println(s"[gen-deep-emb] $out current, skipping")
      else {
        println(s"[gen-deep-emb] $out x$n from $src")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        ScaleCurve.genEmbeddings(spark, src, out, n)
      }
    }
    spark.stop()
  }
}
