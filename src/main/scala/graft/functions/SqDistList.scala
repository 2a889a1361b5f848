// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see NearestSeed, SimHash16, MinHash8).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native squared-L2 distance LIST of a vector (or a contiguous
  * subspace of it) against a driver-held literal codebook — the
  * IVF/PQ encode primitive n10 runs per corpus row. Replaces the
  * composed form
  *
  *   transform(typedLit(book), ref ->
  *     aggregate(zip_with(slice(v, start+1, L), ref,
  *                        (x, y) -> (double(x) - y) * (double(x) - y)),
  *               0.0, (acc, d) -> acc + d))
  *
  * whose nested interpreted lambdas paid K × (zip_with allocation +
  * per-element lambda projection + fold) per row AND carried the
  * whole codebook as literal arrays in the expression tree (plan
  * analysis weight — the n10 comment documents 1.5 s of pure
  * plan/codegen cost for the flat form). Here the codebook is a
  * compact reference object and the distances are two generated
  * loops; arithmetic is IDENTICAL: floats widen to double per
  * element, differences square and accumulate LEFT-TO-RIGHT in index
  * order, so every double is bit-equal to the composed fold
  * (SqDistListSpec pins it, and the DuckDB oracles keep replaying the
  * composed SQL).
  *
  * zip_with length semantics are preserved: a book row is compared
  * only against the slice [start, start+row.length); if the sliced
  * vector is shorter or longer than the row, zip_with would have
  * padded with nulls and the fold would return NULL — mirrored here
  * as a NULL list element. `start` is 0-based (the composed slice is
  * 1-based `slice(v, start+1, L)`).
  */
case class SqDistList(child: Expression, book: Seq[Seq[Double]], start: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(start >= 0, s"start must be >= 0, got $start")

  // def, not val: TypeCollection is not Serializable (NearestSeed's
  // lesson) — must not be captured in the interpreted task closure
  private def floatOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] = Seq(floatOrDoubleArray)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "sq_dist_list"

  private def embIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  @transient private lazy val bookArr: Array[Array[Double]] =
    book.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    SqDistOps.distList(v.asInstanceOf[ArrayData], bookArr, start, embIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("sqdlBook", bookArr, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graftnative.SqDistOps" +
        s".distList($v, $bookRef, $start, $embIsDouble);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object SqDistOps {
  def distList(vec: ArrayData, book: Array[Array[Double]], start: Int,
               isDouble: Boolean): ArrayData = {
    val n = vec.numElements()
    // the composed slice(v, start+1, L) yields max(0, min(L, n-start))
    // elements; zip_with pads to the book row's length with nulls, and
    // any null padding makes that row's fold NULL
    val avail = math.max(0, n - start)
    val out = new Array[Any](book.length)
    var k = 0
    while (k < book.length) {
      val row = book(k)
      // slice length is capped at row.length by every call site's L ==
      // row.length; shorter input → null (padded), longer cannot occur
      if (avail < row.length) out(k) = null
      else {
        var s = 0.0
        var i = 0
        while (i < row.length) {
          val x = if (isDouble) vec.getDouble(start + i)
                  else vec.getFloat(start + i).toDouble
          val d = x - row(i)
          s += d * d
          i += 1
        }
        out(k) = s
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}
