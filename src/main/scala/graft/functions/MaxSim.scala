// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces (AbstractDataType) — the established pattern for
// third-party native expressions (see CosineSimilarity).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, DoubleType, FloatType,
  TypeCollection}

/** Native codegen'd ColBERT-style MaxSim over two packed multi-vector
  * columns: both arrays are read as consecutive `tokDim`-wide token
  * vectors, and the result is Σ over query tokens of the MAX dot
  * product against any candidate token.
  *
  * The composable form (nested aggregate/transform/zip_with/slice
  * HOFs — n13's original shape) evaluates an interpreted lambda per
  * element and materializes a sliced array per (token, token) dot
  * product: ~matrix-size allocations per ROW PAIR. This expression is
  * the n13 escalation of the SURVEY §2.12 "custom Expression only if
  * perf demands" rule (taken after n13 sat in the bench top-3 at
  * ~2 s): one straight-line nested loop inside whole-stage codegen,
  * zero allocation.
  *
  * Semantics match the HOF form bit-exactly FOR NON-EMPTY, FINITE
  * inputs — the regime n13's fixed 64-element embeddings live in, and
  * the one MaxSimSpec pins over 1000 pairs: dots fold left-to-right
  * in doubles (floats widened before arithmetic), the per-query-token
  * max is a `>` fold in candidate-token order, and token counts are
  * numElements / tokDim (trailing partial tokens ignored, like the
  * slice-based original). Outside that regime the two forms diverge
  * by construction: an empty candidate side yields 0.0 here where the
  * HOF's array_max over an empty array yields NULL, and NaN dot
  * products follow the `>` fold (kept only when first) where
  * array_max propagates NaN.
  */
case class MaxSim(left: Expression, right: Expression, tokDim: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(tokDim > 0, s"tokDim must be positive: $tokDim")

  // def, not val: TypeCollection is not Serializable and must not be
  // captured in the task closure when the expression ships interpreted
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, floatOrDoubleArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "maxsim"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDouble(left)
    val yd = isDouble(right)
    def xAt(i: Int): Double = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
    def yAt(i: Int): Double = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
    val nq = x.numElements() / tokDim
    val nc = y.numElements() / tokDim
    var acc = 0.0
    var qi = 0
    while (qi < nq) {
      var best = 0.0
      var first = true
      var di = 0
      while (di < nc) {
        var dot = 0.0
        var k = 0
        while (k < tokDim) {
          dot += xAt(qi * tokDim + k) * yAt(di * tokDim + k)
          k += 1
        }
        if (first || dot > best) { best = dot; first = false }
        di += 1
      }
      if (!first) acc += best
      qi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val qi = ctx.freshName("qi")
      val di = ctx.freshName("di")
      val k = ctx.freshName("k")
      val nq = ctx.freshName("nq")
      val nc = ctx.freshName("nc")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val first = ctx.freshName("first")
      val dot = ctx.freshName("dot")
      def get(arr: String, idx: String, dbl: Boolean) =
        if (dbl) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      val aAt = get(a, s"$qi * $tokDim + $k", isDouble(left))
      val bAt = get(b, s"$di * $tokDim + $k", isDouble(right))
      s"""
         |int $nq = $a.numElements() / $tokDim;
         |int $nc = $b.numElements() / $tokDim;
         |double $acc = 0.0;
         |for (int $qi = 0; $qi < $nq; $qi++) {
         |  double $best = 0.0;
         |  boolean $first = true;
         |  for (int $di = 0; $di < $nc; $di++) {
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $tokDim; $k++) {
         |      $dot += $aAt * $bAt;
         |    }
         |    if ($first || $dot > $best) { $best = $dot; $first = false; }
         |  }
         |  if (!$first) $acc += $best;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
