package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.SqDistList
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native sq_dist_list kernel must be bit-identical to the
  * composed fold it replaced (n10/n8's codebook distance lists) —
  * that equivalence is what keeps their DuckDB oracles valid. The
  * pinned reference is the SLICED composed form
  * `transform(book, ref -> aggregate(zip_with(slice(v, start+1, L),
  * ref, (x,y) -> (double(x)-y)*(double(x)-y)), 0.0, acc+d))` with
  * L = the book row length (every call site's shape; n10's unsliced
  * cdl differs from it only on vectors LONGER than the codebook dim,
  * which the fixed-width embeddings table cannot produce).
  */
class SqDistListSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def refCol(book: Seq[Seq[Double]], start: Int) = {
    val rows = book.map { ref =>
      aggregate(
        zip_with(slice(col("embedding"), start + 1, ref.length),
                 lit(ref.toArray),
                 (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
        lit(0.0), (acc, v) => acc + v)
    }
    array(rows: _*)
  }

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val book: Seq[Seq[Double]] = emb.filter(col("vec_id") < 4)
    .orderBy("vec_id").collect()
    .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq

  test("kernel == composed sliced fold on the real corpus, full-dim and subspace") {
    val sub = book.map(_.slice(16, 24))
    val df = emb
      .withColumn("k_full", VectorFunctions.sqDistList(col("embedding"), book, 0))
      .withColumn("h_full", refCol(book, 0))
      .withColumn("k_sub", VectorFunctions.sqDistList(col("embedding"), sub, 16))
      .withColumn("h_sub", refCol(sub, 16))
    assert(df.count() > 0)
    // bit equality, not approximate: same widening, same fold order
    assert(df.filter(not(col("k_full") <=> col("h_full"))).count() == 0)
    assert(df.filter(not(col("k_sub") <=> col("h_sub"))).count() == 0)
    assert(df.select(countDistinct(col("k_full"))).head.getLong(0) > 1)
  }

  test("interpreted path matches codegen; short vector yields null entries") {
    val rows = emb.orderBy("vec_id").limit(10)
      .withColumn("k", VectorFunctions.sqDistList(col("embedding"), book, 0))
      .collect()
    rows.foreach { r =>
      val interp = SqDistList(
        Literal.create(r.getSeq[Float](1), ArrayType(FloatType)), book, 0)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
      assert(interp.toDoubleArray().toSeq == r.getSeq[Double](2),
             s"interp mismatch at vec_id ${r.get(0)}")
    }
    // vector shorter than start + row length → zip_with would pad with
    // nulls and the fold would be NULL: the kernel's element is null
    val short = SqDistList(
      Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType)),
      Seq(Seq(1.0, 2.0, 3.0)), 0).eval(InternalRow.empty)
      .asInstanceOf[ArrayData]
    assert(short.numElements() == 1 && short.isNullAt(0))
    // null vector propagates
    assert(SqDistList(Literal.create(null, ArrayType(FloatType)),
      Seq(Seq(1.0)), 0).eval(InternalRow.empty) == null)
  }

  test("double-element vectors take the getDouble path with equal values") {
    import spark.implicits._
    val v = Seq(Tuple1(Seq(0.5, 1.5, -2.0))).toDF("embedding")
    val got = v.select(VectorFunctions.sqDistList(
        col("embedding"), Seq(Seq(0.0, 1.0, -1.0)), 0).as("dl"))
      .head.getSeq[Double](0)
    assert(got == Seq(0.25 + 0.25 + 1.0))
  }
}
