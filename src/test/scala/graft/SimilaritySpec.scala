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
