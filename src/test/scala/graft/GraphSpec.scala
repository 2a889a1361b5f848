package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the integer-ppm PageRank (g1) that the DuckDB oracle
  * compare can't express: mass conservation under integer floors, the
  * teleport floor, and stability under a different partitioning.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ranks() =
    operators.Graph.queries("g1_pagerank")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("rank mass is conserved up to integer-floor loss") {
    val r = ranks()
    val k = r.size.toLong
    val total = r.values.sum
    // Exact arithmetic would keep total = K * 1e6 (teleport + damping
    // redistribute, never create). Each iteration floors once per
    // aggregated edge ((r*w) DIV outw) and once per node (DIV 1e6), so
    // 3 iterations over a K-node graph lose < 3 * (K*K + K) units —
    // bounded by graph SHAPE, not corpus size.
    assert(total <= k * 1000000L, s"mass created: $total > ${k * 1000000L}")
    assert(total >= k * 1000000L - 3 * (k * k + k),
      s"mass lost beyond floor bound: $total")
  }

  test("every node keeps the teleport floor and the graph is non-degenerate") {
    val r = ranks()
    assert(r.values.forall(_ >= 150000L),
      "damping teleport guarantees 150000 ppm minimum")
    assert(r.values.max > r.values.min,
      "uniform ranks mean the iteration never moved mass")
  }

  test("ranks are identical under a different shuffle partitioning") {
    val base = ranks()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(ranks() == base,
        "integer-ppm iteration must be partition-count-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
