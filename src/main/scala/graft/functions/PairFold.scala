// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces (AbstractDataType) — the established pattern for
// third-party native expressions (see CosineSimilarity.scala).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType,
  TypeCollection}

/** Shared scaffolding for the element-wise pair folds that the n-family
  * composed as `aggregate(zip_with(a, b, f), init, (acc, x) -> acc + x)`
  * interpreted HOFs. Each fold is per JOINED PAIR on the ANN brute/
  * rerank/fusion paths (|Q| × N evaluations), so the interpreted-lambda
  * + intermediate-array cost scales with the candidate stream — the
  * same per-pair waste class CosineSimilarity/MaxSim removed (guide
  * §1.2 step 2 / §4.1: prefer codegen expressions in the hot path).
  *
  * zip_with length semantics are preserved exactly: zip_with pads the
  * shorter side with NULLs, `f` of a NULL is NULL, and `acc + NULL`
  * poisons the whole fold — so a length mismatch returns NULL here
  * too (n-family arrays are all 64-dim, so this is an edge contract,
  * not a live path; PairFoldSpec pins it). Element NULLS are NOT
  * handled: like CosineSimilarity, these kernels read elements
  * unchecked and rely on the non-null-element invariant of every live
  * input (parquet float arrays and arithmetic transforms of them —
  * none can contain null elements). A containsNull=true array passes
  * the inputTypes check (acceptsType ignores nullability) but feeding
  * one with an actual null element through the public VectorFunctions
  * API is unspecified here, where the composed zip_with fold would
  * have returned NULL — don't route such columns through these
  * kernels without adding an isNullAt guard first.
  */
trait PairFoldBase extends BinaryExpression with ExpectsInputTypes {
  // nullable beyond the children's nullability: a length mismatch
  // returns NULL (the zip_with-pad contract), so codegen must carry a
  // real isNull slot even over non-null inputs (the NearestSeed rule)
  override def nullable: Boolean = true
  protected def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  protected def elemAt(arr: ArrayData, dbl: Boolean, i: Int): Double =
    if (dbl) arr.getDouble(i) else arr.getFloat(i).toDouble
  protected def genGet(arr: String, dbl: Boolean, i: String): String =
    if (dbl) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
}

/** Native dot product Σ double(a_i)·double(b_i), left-to-right — the
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  * (acc, x) -> acc + x)` idiom (n9's scoring fold, the n2/n3/n16 LSH
  * plane signs) as one generated loop. Each side independently
  * array<float> or array<double> (LSH planes are double literals,
  * embeddings float), same widening rule as CosineSimilarity.
  */
case class DotProduct(left: Expression, right: Expression)
    extends PairFoldBase {
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, floatOrDoubleArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (xd, yd) = (isDouble(left), isDouble(right))
      var dot = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { dot += elemAt(x, xd, i) * elemAt(y, yd, i); i += 1 }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val aAt = genGet(a, isDouble(left), i)
      val bAt = genGet(b, isDouble(right), i)
      // numElements() hoisted into a local (the CosineSimilarity
      // pattern): these loops run once per joined pair on the |Q|×N
      // candidate stream, so don't bet on the JIT doing it
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $aAt * $bAt;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product Σ a_i·b_i over two array<bigint> columns
  * — n11's quantized-code scoring fold
  * (`aggregate(zip_with(qc, cc, (a, b) -> a * b), 0L, ...)`) as one
  * generated loop. Long arithmetic wraps like Java (the composed form
  * cannot overflow on n11's |code| ≤ ~400, 64-dim inputs, so the
  * semantics agree everywhere reachable).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends PairFoldBase {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared L2 distance Σ (double(a_i) − double(b_i))², left-to-
  * right — n12's retriever-B fold
  * (`aggregate(zip_with(cast(a as array<double>), cast(b as
  * array<double>), (x, y) -> (x - y) * (x - y)), 0D, ...)`) as one
  * generated loop. The composed cast-to-double-array widens per
  * element before subtracting; the kernel does the same, so every
  * partial sum is bit-identical.
  */
case class SqDistance(left: Expression, right: Expression)
    extends PairFoldBase {
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, floatOrDoubleArray)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (xd, yd) = (isDouble(left), isDouble(right))
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val d = elemAt(x, xd, i) - elemAt(y, yd, i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("d")
      val aAt = genGet(a, isDouble(left), i)
      val bAt = genGet(b, isDouble(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dv = $aAt - $bAt;
         |    $acc += $dv * $dv;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
