package graft

import graft.functions.{DeterministicHash, VectorFunctions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.MinHash8
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native minhash8 kernel must be bit-identical to the composed
  * HOF form it replaced (baseHashes transform + 8 per-permutation
  * transform/array_min passes) — that equivalence is what keeps every
  * minhash-family DuckDB oracle (d2/d3/d9/d16/d21/wb7) valid.
  */
class MinHash8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val seeds: Seq[Long] =
    (0 until 8).map(j => DeterministicHash.h32Local(s"minhash-seed:$j"))

  // the ORIGINAL composed form, kept verbatim as the reference
  private val hofMinhash = {
    val mh = (j: Int) =>
      s"""array_min(transform(
         |  transform(sh, x -> cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)),
         |  h -> h ^ ${seeds(j)}L))""".stripMargin
    (0 until 8).map(mh).mkString("array(", ", ", ")")
  }

  private val shingles =
    """if(size(ws) < 3, array(concat_ws(' ', ws)),
      |   transform(sequence(1, size(ws) - 2),
      |             i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1), element_at(ws, i+2))))""".stripMargin

  test("kernel == composed HOF form on the real corpus (codegen path)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("sh", expr(shingles))
    val df = d
      .withColumn("native", VectorFunctions.minHash8(col("sh"), seeds))
      .withColumn("hof", expr(hofMinhash))
    assert(df.count() > 0)
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    // minima actually vary across docs (guards a degenerate kernel)
    assert(df.select(countDistinct(col("native"))).head.getLong(0) > 1)
  }

  private def evalInterp(sh: Seq[String]): Any =
    MinHash8(Literal.create(sh, ArrayType(StringType)), seeds)
      .eval(InternalRow.empty)

  test("interpreted path matches codegen on sampled docs") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("sh", expr(shingles))
      .withColumn("native", VectorFunctions.minHash8(col("sh"), seeds))
      .orderBy("doc_id").limit(25).collect()
    rows.foreach { r =>
      val got = evalInterp(r.getSeq[String](2)).asInstanceOf[ArrayData]
      assert(got.toLongArray().toSeq == r.getSeq[Long](3),
             s"interpreted mismatch at doc_id ${r.get(0)}")
    }
  }

  test("edge cases: empty → 8 nulls, null elements skipped, null array → null") {
    // empty shingle array: array_min(empty) is NULL per permutation
    val empty = evalInterp(Seq.empty).asInstanceOf[ArrayData]
    assert(empty.numElements() == 8)
    assert((0 until 8).forall(empty.isNullAt))
    // null elements are skipped (array_min semantics); remaining
    // shingles still produce minima — parity with the composed form
    // through a real plan
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a b c", null, "c d e")),
                 Tuple1(Seq.empty[String]),
                 Tuple1(Seq[String](null)))
      .toDF("sh")
      .withColumn("native", VectorFunctions.minHash8(col("sh"), seeds))
      .withColumn("hof", expr(hofMinhash))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    // null array propagates
    assert(MinHash8(Literal.create(null, ArrayType(StringType)), seeds)
      .eval(InternalRow.empty) == null)
  }

  test("single shingle: minima are exactly hash ^ seed_j") {
    val got = evalInterp(Seq("hello world x")).asInstanceOf[ArrayData]
      .toLongArray().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest("hello world x".getBytes("UTF-8"))
    val h = ((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
            ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)
    assert(got == seeds.map(h ^ _))
  }
}
