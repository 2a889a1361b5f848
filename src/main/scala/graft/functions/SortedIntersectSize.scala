// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces (ExpressionUtils) — the established pattern for
// third-party native expressions (see CosineSimilarity).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd |A ∩ B| for two ASCENDING-SORTED long arrays with
  * distinct elements — the verification kernel of the prefix-filter
  * set-similarity join (d8), where `size(array_intersect(a, b))` was
  * the hot path: Spark's ArrayIntersect builds a per-row hash set AND
  * materializes the intersection array, only for `size` to throw the
  * elements away. This expression is the classic two-pointer merge —
  * zero allocation, one linear pass, branch-predictable long compares
  * — fused into whole-stage codegen.
  *
  * PRECONDITION (caller-enforced, spec-pinned): both arrays sorted
  * ascending with distinct values. d8 sorts each document's token set
  * ONCE (array_sort at the doc grain, amortized over every candidate
  * pair the doc appears in); the merge then runs per pair. Equal
  * values count once (inputs are sets). Nulls propagate (BinaryExpression
  * null-safe contract); null ELEMENTS are not expected (tokens are
  * md5-prefix hashes) and would violate the sort precondition anyway.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val xa = x.getLong(i)
      val xb = y.getLong(j)
      if (xa < xb) i += 1
      else if (xa > xb) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xa = $a.getLong($i);
         |  long $xb = $b.getLong($j);
         |  if ($xa < $xb) { $i++; }
         |  else if ($xa > $xb) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
