package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.NearestSeed
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native nearest_seed kernel's semantics directly (r13
  * advice: it was the only native kernel whose contract was pinned
  * only transitively through the 8 SemDeDup/IVF oracle queries):
  *  - argmax by (cosine DESC, cell ASC) — ties resolve to the LOWEST
  *    cell id under the caller's cells-ascending contract;
  *  - zero-norm (embedding or seed) → csim 0.0, never NaN;
  *  - float-emb and double-emb inputs assign identically on
  *    float-exact values;
  *  - the interpreted nullSafeEval path ≡ the whole-stage-codegen
  *    path ≡ the pre-r13 crossJoin + max_by(cell, struct(csim,
  *    -cell)) reference on a real corpus;
  *  - an EMPTY codebook yields NULL (not an error) — the pre-r13
  *    crossJoin form produced empty output on a seedless corpus, and
  *    the kernel must preserve that as a droppable null, not a job
  *    failure.
  */
class NearestSeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val embT = ArrayType(DoubleType)
  private val cellsT = ArrayType(LongType)
  private val seedsT = ArrayType(ArrayType(DoubleType))

  /** Interpreted path: TernaryExpression.eval → nullSafeEval. */
  private def evalInterp(emb: Seq[Double], cells: Seq[Long],
                         seeds: Seq[Seq[Double]]): Any =
    NearestSeed(Literal.create(emb, embT), Literal.create(cells, cellsT),
                Literal.create(seeds, seedsT)).eval(InternalRow.empty)

  test("tie resolves to the lowest cell id (cells ascending)") {
    // two IDENTICAL seeds: csim ties exactly; strict-greater keeps the
    // first (= lowest id under the ascending contract)
    val got = evalInterp(Seq(1.0, 0.0), Seq(5L, 9L),
                         Seq(Seq(1.0, 0.0), Seq(1.0, 0.0)))
    assert(got == 5L)
    // a LATER seed that is strictly better still wins
    val got2 = evalInterp(Seq(1.0, 0.0), Seq(5L, 9L),
                          Seq(Seq(0.0, 1.0), Seq(1.0, 0.0)))
    assert(got2 == 9L)
  }

  test("zero norm yields csim 0.0, never NaN") {
    // zero EMBEDDING: every csim is 0.0 → all tie → lowest cell
    assert(evalInterp(Seq(0.0, 0.0), Seq(3L, 7L),
                      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))) == 3L)
    // zero SEED scores 0.0, which beats a negative-cosine seed
    assert(evalInterp(Seq(1.0, 0.0), Seq(1L, 2L),
                      Seq(Seq(-1.0, 0.0), Seq(0.0, 0.0))) == 2L)
    // ...and loses to any positive-cosine seed
    assert(evalInterp(Seq(1.0, 0.0), Seq(1L, 2L),
                      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))) == 2L)
  }

  test("empty codebook yields null — interpreted and codegen") {
    assert(evalInterp(Seq(1.0, 0.0), Seq.empty, Seq.empty) == null)
    // codegen path through a real plan
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq.empty[Long], Seq.empty[Seq[Double]]))
      .toDF("emb", "cells", "seeds")
      .select(VectorFunctions.nearestSeed(
        col("emb"), col("cells"), col("seeds")).as("cell"))
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).isNullAt(0))
  }

  test("float-emb and double-emb assign identically on float-exact values") {
    import spark.implicits._
    // float-exact components (powers of two) so the widening is lossless
    val embs = Seq(
      (1L, Seq(0.5f, 0.25f, -0.125f)),
      (2L, Seq(-1.0f, 2.0f, 0.5f)),
      (3L, Seq(0.0f, 0.0f, 0.0f)),
      (4L, Seq(4.0f, -0.5f, 1.0f)))
    val cells = Seq(10L, 20L, 30L)
    val seeds = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.5, 0.5, 0.5))
    val f = embs.toDF("id", "emb")
      .select(col("id"), VectorFunctions.nearestSeed(
        col("emb"),
        typedLit(cells), typedLit(seeds)).as("cell"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val d = embs.map { case (i, e) => (i, e.map(_.toDouble)) }
      .toDF("id", "emb")
      .select(col("id"), VectorFunctions.nearestSeed(
        col("emb"),
        typedLit(cells), typedLit(seeds)).as("cell"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(f.toSeq == d.toSeq)
  }

  test("kernel == crossJoin + max_by reference == interpreted, on a real corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // rank-based K=8 codebook, exactly the SemDeDup call sites' shape:
    // the K lowest EXISTING vec_ids, cells ascending, double-cast seeds
    val seedRows = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
    val cells = seedRows.map(_.getLong(0)).toSeq
    val seeds = seedRows.map(_.getSeq[Double](1)).toSeq
    val kernel = e.select(
        col("vec_id"),
        VectorFunctions.nearestSeed(col("embedding"), typedLit(cells),
                                    typedLit(seeds)).as("cell"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the pre-r13 reference: crossJoin against the unpacked codebook,
    // max_by(cell, struct(csim, -cell)) — strict (csim DESC, cell ASC)
    val cb = spark.createDataFrame(
      spark.sparkContext.parallelize(cells.zip(seeds).map {
        case (c, s) => org.apache.spark.sql.Row(c, s)
      }),
      StructType(Seq(StructField("cell", LongType),
                     StructField("seed", ArrayType(DoubleType)))))
    val ref = e.crossJoin(broadcast(cb))
      .withColumn("csim", VectorFunctions.cosineSim(col("embedding"), col("seed")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(cell, struct(csim, -cell))").as("cell"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kernel.toSeq == ref.toSeq)
    assert(kernel.nonEmpty)
    // interpreted parity on a sample of the same corpus
    val sample = e.orderBy(col("vec_id")).limit(25)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
    val byId = kernel.toMap
    sample.foreach { r =>
      val got = evalInterp(r.getSeq[Double](1), cells, seeds)
      assert(got == byId(r.getLong(0)),
             s"interpreted mismatch at vec_id ${r.getLong(0)}")
    }
  }
}
