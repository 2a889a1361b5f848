// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see CosineSimilarity, SimHash16, MinHash8).
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token statistics — the Gopher-rule quality
  * metrics (t11/t14/t16) in ONE pass over the in-row token array:
  *
  *   top_cnt       = array_max(transform(array_distinct(ws),
  *                     w -> size(filter(ws, x -> x = w))))
  *   dup2_distinct = size(array_distinct(transform(sequence(1, n-1),
  *                     i -> concat_ws(' ', ws[i], ws[i+1]))))
  *   distinct_cnt  = size(array_distinct(ws))
  *   coll          = aggregate(transform(array_distinct(ws),
  *                     w -> cast(size(filter(ws, x -> x = w)) as bigint)),
  *                     0L, (a, c) -> a + c*c)
  *
  * The composed forms are O(distinct × n) interpreted lambda passes
  * per document (every distinct token re-scans the array, every pass
  * through the HOF machinery allocates); this kernel is one hash-map
  * pass plus one adjacent-bigram pass, generated inline (the
  * d4/SimHash16 lesson applied to the quality-gate family).
  *
  * Edge semantics replicate the composed forms exactly
  * (TokenStatsSpec pins them): NULL tokens count toward n and toward
  * distinct_cnt (array_distinct keeps one null), contribute a 0 to
  * the count list (`x = null` is never true, so the filter is empty),
  * and are SKIPPED inside bigram strings (concat_ws semantics); an
  * empty array yields top_cnt NULL (array_max of nothing), 0 for the
  * other fields; a NULL array propagates.
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("top_cnt", IntegerType, nullable = true),
    StructField("dup2_distinct", IntegerType, nullable = false),
    StructField("distinct_cnt", IntegerType, nullable = false),
    StructField("coll", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(a: Any): Any =
    TokenStatsOps.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TokenStatsOps.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object TokenStatsOps {
  private val space = UTF8String.fromString(" ")

  def stats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var nullSeen = false
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) nullSeen = true
      else {
        val t = ws.getUTF8String(i)
        val c = counts.get(t)
        if (c == null) counts.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    var top = 0
    var coll = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      coll += c.toLong * c
    }
    // a null token is one distinct value whose filter-count is 0
    // (x = null never holds): +0 to coll, a 0 entry the max ignores
    // unless it is the only one
    val distinctCnt = counts.size + (if (nullSeen) 1 else 0)
    val bigrams = new java.util.HashSet[UTF8String]()
    i = 0
    while (i + 1 < n) {
      val a = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      val b = if (ws.isNullAt(i + 1)) null else ws.getUTF8String(i + 1)
      // concat_ws skips nulls — (a, null) → "a", (null, null) → ""
      bigrams.add(UTF8String.concatWs(space, a, b))
      i += 1
    }
    // empty array: array_max over an empty count list is NULL
    val topBoxed: Any =
      if (counts.isEmpty && !nullSeen) null else Integer.valueOf(top)
    InternalRow(topBoxed, bigrams.size, distinctCnt, coll)
  }
}
