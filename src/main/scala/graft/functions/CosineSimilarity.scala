// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces (AbstractDataType, ExpressionUtils) — the
// established pattern for third-party native expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, DoubleType, FloatType,
  TypeCollection}

/** Native codegen'd cosine similarity over two vector columns — each
  * side independently array<float> or array<double> (k-means centroids
  * are exact double means of float vectors and must NOT be narrowed
  * back to float, so an implicit cast would corrupt them).
  *
  * The composable form (zip_with + aggregate + transform) materializes
  * three intermediate arrays per row pair; this expression fuses dot
  * product and both norms into ONE pass over the backing arrays inside
  * whole-stage codegen — the SURVEY.md §2.12 "custom Expression only
  * if perf demands" escalation, taken after measuring brute-force
  * top-k as the slowest bench query.
  *
  * Semantics match the HOF form exactly (same left-to-right double
  * fold, dot over min length, norms over full arrays, floats widened
  * to double before any arithmetic), so the DuckDB oracle is
  * unchanged. Zero-norm inputs yield 0.0, not NaN.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // def, not val: TypeCollection is not Serializable and must not be
  // captured in the task closure when the expression ships interpreted
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, floatOrDoubleArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

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
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xAt(i) * yAt(i); i += 1 }
    var nx = 0.0
    i = 0
    while (i < x.numElements()) { val v = xAt(i); nx += v * v; i += 1 }
    var ny = 0.0
    i = 0
    while (i < y.numElements()) { val v = yAt(i); ny += v * v; i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val v = ctx.freshName("v")
      def get(arr: String, dbl: Boolean) =
        if (dbl) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      val aAt = get(a, isDouble(left))
      val bAt = get(b, isDouble(right))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $aAt * $bAt;
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $aAt; $nx += $v * $v;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $v = $bAt; $ny += $v * $v;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
