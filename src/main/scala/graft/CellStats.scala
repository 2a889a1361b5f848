package graft

import org.apache.spark.sql.functions._

/** Structural evidence for the assignment-family scale claims —
  * timer-free, like CandCount for d8. For a corpus dir it prints one
  * JSON line per design: N, seed count K, number of distinct cells,
  * max/mean cell width, and the implied within-cell pair enumeration
  * Σ n_c·(n_c−1)/2 — the quantity the r12 investigation argued
  * re-grows quadratically under saturated threshold seeding and the
  * r13 rank seeding bounds. Walls on this host are bimodal; these
  * counts are exact and reproduce.
  *
  * Usage: runMain graft.CellStats <corpusDir> [corpusDir...]
  */
object CellStats {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.CellStats <corpusDir>...")
    val spark = GenSession.local()
    args.foreach { d =>
      val e = graft.sources.Tables.embeddings(spark, d)
      val n = e.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toLong
      // replay cellAssigned's rank seeding + assignment, then the
      // width rollup (no pair join executed — widths imply the count)
      val cents = e.select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id")).limit(k.toInt).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
        .sortBy(_._1).toSeq
      // the kernel-based assignment (cellAssigned's r13 shape). The
      // crossJoin + max_by(struct) replay this main originally used
      // was itself the proof of the r13 finding: ObjectHashAggregate's
      // 128-key sort fallback sorted the N×K product and died of a
      // >70 GB spill at sf300 — this rollup now exists to show the
      // kernel's cells are bounded, measured, at every deep scale.
      val widths = e.select(col("vec_id"),
          graft.functions.VectorFunctions.nearestSeed(col("embedding"),
            typedLit(cents.map(_._1)), typedLit(cents.map(_._2)))
            .as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("w"))
        .agg(count(lit(1)).as("n_cells"), max(col("w")).as("max_w"),
             avg(col("w")).as("mean_w"),
             sum(col("w") * (col("w") - 1) / 2).as("pairs"))
        .head()
      println(s"""CELLSTATS {"dir":"$d","n":$n,"k":$k,""" +
        s""""n_cells":${widths.getLong(0)},"max_w":${widths.getLong(1)},""" +
        f""""mean_w":${widths.getDouble(2)}%.1f,""" +
        s""""within_cell_pairs":${widths.getDouble(3).toLong}}""")
    }
    spark.stop()
  }
}
