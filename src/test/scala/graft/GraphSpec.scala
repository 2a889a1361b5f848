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

/** g5 label-propagation invariants the results-only oracle can't pin:
  * community labels are node ids, sizes tile the node set, and the
  * deterministic tie rule makes the outcome partition-invariant.
  */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def communities() =
    operators.Graph.queries("g5_label_prop")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("community sizes tile the node set and labels are node ids") {
    val rows = communities()
    val n = rows.length.toLong
    // every node appears exactly once
    assert(rows.map(_._1).distinct.length.toLong == n)
    // reported size == actual member count for every community
    val bySize = rows.groupBy(_._2).map { case (l, m) => (l, m.length.toLong) }
    assert(rows.forall { case (_, lbl, sz) => bySize(lbl) == sz },
      "community_size must equal the member count of its label")
    // labels live in the initial id space [0, n)
    assert(rows.forall { case (_, lbl, _) => lbl >= 0 && lbl < n })
  }

  test("propagation is non-degenerate and partition-invariant") {
    val base = communities().sortBy(_._1)
    // at least one node adopted a neighbor's label (otherwise the
    // weight-majority rule never fired and the query is an identity)
    assert(base.map(_._2).distinct.length < base.length,
      "every node kept its own label — propagation never moved")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(communities().sortBy(_._1).sameElements(base),
        "deterministic tie rule must make LPA partition-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
