// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for third-party native
// expressions (see CosineSimilarity.scala).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType,
  TypeCollection}

/** Native codegen'd nearest-seed assignment: the argmax cell over a
  * packed codebook, by (cosine DESC, cell ASC) — the r13 rewrite of
  * the crossJoin + `max_by(cell, struct(csim, -cell))` assignment the
  * SemDeDup family (d14/d23/d24/d25) shared.
  *
  * Why the aggregate form was a 100-TB killer, found by CellStats at
  * 6M vectors: `max_by` with a STRUCT ordering key has a struct-typed
  * aggregation buffer, which HashAggregateExec's fixed-width unsafe
  * rows cannot hold, so the groupBy(vec_id) partial aggregation runs
  * as ObjectHashAggregateExec — and that operator falls back to
  * SORT-BASED aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128!)
  * distinct keys per partition. The "map-side partial" was therefore
  * a full SORT of the N×K crossJoin product: at sf300 (6M vectors ×
  * 2449 seeds) the sort spilled >70 GB and killed the job. This
  * expression evaluates the same K cosines per row inside ONE
  * whole-stage-codegen loop — no row blow-up, no aggregation, no
  * exchange; assignment becomes a pure map over the corpus.
  *
  * Semantics are oracle-exact: per seed the cosine is computed with
  * CosineSimilarity's fold (floats widened to double per element,
  * left-to-right double accumulation, zero-norm → 0.0), and the
  * argmax keeps a strictly-greater similarity only — so with `cells`
  * sorted ASCENDING (caller contract; every call site sorts its
  * codebook by id before packing), ties resolve to the LOWEST cell
  * id, exactly the oracle's
  * `row_number() OVER (ORDER BY csim DESC, cell ASC) = 1`.
  *
  * children: (embedding array<float|double>,
  *            cells array<long>  — seed ids, ascending,
  *            seeds array<array<double>> — codebook, same order).
  * Returns the winning cell id (long); null on null inputs AND on an
  * empty codebook (r13 advice: the pre-r13 crossJoin form produced
  * empty output on a seedless corpus — e.g. n4's fixed id-range
  * centroids over a corpus below that range — so throwing here would
  * turn an empty-result case into a job failure; null preserves it,
  * and every downstream use filters or joins the assignment away).
  */
case class NearestSeed(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  // def, not val: TypeCollection is not Serializable and must not be
  // captured in the task closure when the expression ships interpreted
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, ArrayType(LongType),
        ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  // nullable beyond the children's nullability: an empty codebook
  // yields null even when all three inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_seed"

  private def embIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(e: Any, c: Any, s: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val cells = c.asInstanceOf[ArrayData]
    val seeds = s.asInstanceOf[ArrayData]
    val k = math.min(cells.numElements(), seeds.numElements())
    if (k == 0) return null
    val ed = embIsDouble
    def embAt(i: Int): Double =
      if (ed) emb.getDouble(i) else emb.getFloat(i).toDouble
    var ne = 0.0
    var i = 0
    while (i < emb.numElements()) { val v = embAt(i); ne += v * v; i += 1 }
    var best = Double.NegativeInfinity
    var bestCell = cells.getLong(0)
    var j = 0
    while (j < k) {
      val se = seeds.getArray(j)
      val n = math.min(emb.numElements(), se.numElements())
      var dot = 0.0
      var ns = 0.0
      i = 0
      while (i < n) { dot += embAt(i) * se.getDouble(i); i += 1 }
      i = 0
      while (i < se.numElements()) {
        val v = se.getDouble(i); ns += v * v; i += 1
      }
      val csim =
        if (ne == 0.0 || ns == 0.0) 0.0
        else dot / (math.sqrt(ne) * math.sqrt(ns))
      if (csim > best) { best = csim; bestCell = cells.getLong(j) }
      j += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c, s) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val ne = ctx.freshName("ne")
      val ns = ctx.freshName("ns")
      val dot = ctx.freshName("dot")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val csim = ctx.freshName("csim")
      val se = ctx.freshName("se")
      val embAt =
        if (embIsDouble) s"$e.getDouble($i)" else s"(double) $e.getFloat($i)"
      s"""
         |int $k = java.lang.Math.min($c.numElements(), $s.numElements());
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ne = 0.0;
         |  for (int $i = 0; $i < $e.numElements(); $i++) {
         |    double $v = $embAt; $ne += $v * $v;
         |  }
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  long $bestCell = $c.getLong(0);
         |  for (int $j = 0; $j < $k; $j++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $se = $s.getArray($j);
         |    int $n = java.lang.Math.min($e.numElements(), $se.numElements());
         |    double $dot = 0.0, $ns = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $embAt * $se.getDouble($i);
         |    }
         |    for (int $i = 0; $i < $se.numElements(); $i++) {
         |      double $v = $se.getDouble($i); $ns += $v * $v;
         |    }
         |    double $csim = ($ne == 0.0 || $ns == 0.0) ? 0.0 :
         |      $dot / (java.lang.Math.sqrt($ne) * java.lang.Math.sqrt($ns));
         |    if ($csim > $best) { $best = $csim; $bestCell = $c.getLong($j); }
         |  }
         |  ${ev.value} = $bestCell;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
