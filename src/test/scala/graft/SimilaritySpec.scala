package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** n9's MIPS reduction and a8's bitmap distinct carry mathematical
  * claims their oracles replay but do not PROVE; these tests prove
  * them against independent in-Spark computations.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.01"

  test("n9: augmented-cosine ranking IS the inner-product ranking (order preservation)") {
    // rank every (query, candidate) pair by raw dot product with the
    // same tie-break and assert the augmented-cosine top-5 matches —
    // the Bachrach et al. reduction theorem, checked exhaustively on
    // this corpus rather than assumed
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val vecs = e.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    val expected = (0L until 8L).flatMap { qid =>
      vecs.keys.filter(_ != qid).toSeq
        .map(cid => (cid, dot(vecs(qid), vecs(cid))))
        .sortBy { case (cid, ip) => (-ip, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    val got = SparkEntry.queries("n9_mips_topk")(spark, sf)
      .select(col("qid"), col("cid"), col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"augmented-cosine rank diverges from inner-product rank: " +
        s"only-got=${got -- expected} only-expected=${expected -- got}")
  }

  test("n10: ADC lookup distance IS the distance to the PQ-reconstructed vector") {
    // the identity product quantization rests on: because subspaces
    // are disjoint coordinate blocks, sum_m ||q_m - c[m][code_m]||^2
    // (eight table lookups) equals ||q - decode(codes)||^2 (distance
    // to the reconstructed vector). Recompute both sides in plain
    // Scala from the raw table and check the query's approx_dist
    // against the reconstruction distance — proving the lookups
    // really are distances to decoded vectors, not just consistent
    // bookkeeping.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val vecs = e.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    val seeds = (0L until 4L).map(vecs)
    def subDist(v: Array[Double], m: Int, k: Int): Double =
      (0 until 8).foldLeft(0.0) { (a, i) =>
        val d = v(m * 8 + i) - seeds(k)(m * 8 + i); a + d * d
      }
    def codesOf(v: Array[Double]): Seq[Int] =
      (0 until 8).map { m =>
        val ds = (0 until 4).map(k => subDist(v, m, k))
        ds.indexOf(ds.min)
      }
    def decode(codes: Seq[Int]): Array[Double] =
      (0 until 64).map(i => seeds(codes(i / 8))(i)).toArray
    val rows = SparkEntry.queries("n10_ivf_pq")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, cid) = (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
      val ad = r.getAs[Double]("approx_dist")
      val q = vecs(qid)
      val rec = decode(codesOf(vecs(cid)))
      val recDist = q.indices.foldLeft(0.0) { (a, i) =>
        val d = q(i) - rec(i); a + d * d
      }
      // ad rounds each of 8 subspace terms to 1e-6 before summing →
      // the two sides agree within 8 * 5e-7 plus float-fold noise
      assert(math.abs(ad - recDist) < 5e-6,
        s"($qid,$cid): ADC $ad != reconstruction distance $recDist")
    }
  }

  test("a8: bitmap popcount sum equals count(DISTINCT) exactly") {
    val got = SparkEntry.queries("a8_bitmap_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"bitmap distinct $got != exact $exact")
  }
}

/** n12 reciprocal-rank-fusion invariants: the fused score must be a
  * pure function of the two retriever ranks (no float leakage into the
  * fusion), and each query's shortlist is exactly the top-5 by that
  * score under the deterministic tie rule.
  */
class RrfFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("fused score derives from ranks and shortlists are exact top-5") {
    val rows = operators.Similarity.queries("n12_rrf_fusion")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rc, rl, ppm, _) =>
      assert(ppm == 1000000L / (60 + rc) + 1000000L / (60 + rl),
        s"rrf_ppm must be the integer RRF of the two ranks (got $ppm)")
    }
    rows.groupBy(_._1).foreach { case (qid, g) =>
      assert(g.map(_._6).sorted.sameElements(1L to 5L),
        s"query $qid shortlist must be fused ranks 1..5")
      // fused order must agree with (rrf desc, cid asc)
      val byRank = g.sortBy(_._6)
      assert(byRank.sameElements(g.sortBy(t => (-t._5, t._2))),
        s"query $qid fused order broke the (rrf desc, cid) tie rule")
    }
  }
}
