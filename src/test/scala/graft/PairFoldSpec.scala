package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.{DotProduct, LongDotProduct, SqDistance}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native pair-fold kernels (dot_product / long_dot_product /
  * sq_distance) must be bit-identical to the composed
  * aggregate(zip_with(...)) folds they replaced on the ANN hot paths
  * (n9's scoring, n2/n3/n16's LSH plane signs, n11's quantized dot,
  * n12's L2 retriever) — that equivalence is what keeps the DuckDB
  * oracles, which replay the composed SQL, valid. Pins: real-corpus
  * bit equality, interpreted ≡ codegen, zip_with length semantics
  * (mismatch → NULL), null propagation, float/double widening parity.
  */
class PairFoldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  // a self-joined pair stream (8 query vectors × corpus), the n-family
  // candidate-stream shape the kernels run on
  private lazy val pairs = {
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .join(broadcast(q), col("qid") =!= col("cid"))
  }

  test("dot_product == composed fold on real pairs, and against a double-array side") {
    val composed = aggregate(
      zip_with(col("qe"), col("ce"),
               (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val df = pairs
      .withColumn("k", VectorFunctions.dotProduct(col("qe"), col("ce")))
      .withColumn("h", composed)
    assert(df.count() > 0)
    assert(df.filter(not(col("k") <=> col("h"))).count() == 0)
    assert(df.select(countDistinct(col("k"))).head.getLong(0) > 1)

    // mixed float × double (the LSH plane shape): same widening rule
    val plane = graft.operators.Similarity.plane(2, 64)
    val mixed = emb
      .withColumn("k", VectorFunctions.dotProduct(col("embedding"),
        typedLit(plane)))
      .withColumn("h", aggregate(
        zip_with(col("embedding"), typedLit(plane),
                 (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, x) => acc + x))
    assert(mixed.filter(not(col("k") <=> col("h"))).count() == 0)
  }

  test("long_dot_product == composed fold on n11's quantized codes") {
    val codes = expr(
      "transform(embedding, v -> cast(floor(cast(v as double) * 100.0) as bigint))")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), codes.as("qc"))
    val df = emb.select(col("vec_id").as("cid"), codes.as("cc"))
      .join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("k", VectorFunctions.longDotProduct(col("qc"), col("cc")))
      .withColumn("h", expr(
        """aggregate(zip_with(qc, cc, (a, b) -> a * b),
          |          cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin))
    assert(df.count() > 0)
    assert(df.filter(not(col("k") <=> col("h"))).count() == 0)
  }

  test("sq_distance == composed cast-to-double fold on real pairs") {
    val composed = expr(
      """aggregate(zip_with(cast(qe as array<double>),
        |                   cast(ce as array<double>),
        |                   (x, y) -> (x - y) * (x - y)),
        |          0D, (acc, v) -> acc + v)""".stripMargin)
    val df = pairs
      .withColumn("k", VectorFunctions.sqDistance(col("qe"), col("ce")))
      .withColumn("h", composed)
    assert(df.count() > 0)
    assert(df.filter(not(col("k") <=> col("h"))).count() == 0)
  }

  test("interpreted path matches codegen on real rows") {
    val rows = pairs.limit(20)
      .withColumn("kd", VectorFunctions.dotProduct(col("qe"), col("ce")))
      .withColumn("ks", VectorFunctions.sqDistance(col("qe"), col("ce")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qe = Literal.create(r.getSeq[Float](r.fieldIndex("qe")),
        ArrayType(FloatType))
      val ce = Literal.create(r.getSeq[Float](r.fieldIndex("ce")),
        ArrayType(FloatType))
      assert(DotProduct(qe, ce).eval(InternalRow.empty) ==
        r.getDouble(r.fieldIndex("kd")))
      assert(SqDistance(qe, ce).eval(InternalRow.empty) ==
        r.getDouble(r.fieldIndex("ks")))
    }
    val a = Literal.create(Seq(3L, -2L, 7L), ArrayType(LongType))
    val b = Literal.create(Seq(10L, 100L, 1000L), ArrayType(LongType))
    assert(LongDotProduct(a, b).eval(InternalRow.empty) ==
      (30L - 200L + 7000L))
  }

  test("zip_with semantics: length mismatch -> NULL, null input -> NULL, empty -> init") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .withColumn("kd", VectorFunctions.dotProduct(col("a"), col("b")))
      .withColumn("ks", VectorFunctions.sqDistance(col("a"), col("b")))
      .withColumn("hd", aggregate(
        zip_with(col("a"), col("b"),
                 (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x))
    val r = df.head
    assert(r.isNullAt(r.fieldIndex("kd")) && r.isNullAt(r.fieldIndex("ks")))
    assert(r.isNullAt(r.fieldIndex("hd"))) // the composed form agrees
    // interpreted path agrees with codegen on the mismatch rule
    val a2 = Literal.create(Seq(1L, 2L), ArrayType(LongType))
    val b3 = Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType))
    assert(LongDotProduct(a2, b3).eval(InternalRow.empty) == null)
    // null input propagates (BinaryExpression null-safety)
    assert(DotProduct(Literal.create(null, ArrayType(FloatType)),
      Literal.create(Seq(1.0f), ArrayType(FloatType)))
      .eval(InternalRow.empty) == null)
    // both empty: fold over an empty zip = the init value
    val e = Literal.create(Seq.empty[Long], ArrayType(LongType))
    assert(LongDotProduct(e, e).eval(InternalRow.empty) == 0L)
  }
}
