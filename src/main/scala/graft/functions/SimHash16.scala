// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see CosineSimilarity, CdcChunkHashes).
package org.apache.spark.sql.graftnative

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native 16-bit SimHash signature over a token array — d4's kernel.
  *
  * Semantics are EXACTLY the composed HOF form it replaces (and the
  * DuckDB oracle still replays): per token, the hash is the first 4
  * hex chars of md5(token) read as an unsigned 16-bit value
  * (`conv(substring(md5(t), 1, 4), 16, 10)` = the digest's top two
  * bytes); per bit b in 0..15 the vote is Σ ((h>>b)&1)*2-1 over
  * tokens, and bit b of the signature is set iff the vote is
  * strictly positive (equivalently: ones(b)*2 > n). An empty token
  * array votes every bit to zero → signature 0; a NULL token element
  * nulls the composed form's running sums, whose `if(NULL > 0, ...)`
  * takes the else branch on every bit → signature 0, mirrored here.
  *
  * Why native (r14): the r13 toRdd re-baselining exposed d4 as the #1
  * bench resident (~3 s) — first diagnosed as 16× redundant md5, but
  * hoisting the per-token hash recovered almost nothing (isolated
  * fresh-JVM min 2.86 s vs 2.78 s): the cost is the nested
  * higher-order-function machinery itself (aggregate over sequence ×
  * transform over tokens = 17 interpreted lambda passes allocating an
  * array per bit per doc). This kernel is ONE generated call per doc:
  * one md5 per token, 16 integer bit-counts, zero per-bit allocation
  * — and it keeps the whole stage inside codegen.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(a: Any): Any =
    SimHashOps.simhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.SimHashOps.simhash16($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object SimHashOps {
  def simhash16(ws: ArrayData): Long = {
    val n = ws.numElements()
    if (n == 0) return 0L
    val md = MessageDigest.getInstance("MD5")
    val ones = new Array[Int](16)
    var i = 0
    while (i < n) {
      // a NULL element made the composed form's per-bit sums NULL and
      // its if(NULL > 0) take the zero branch on every bit
      if (ws.isNullAt(i)) return 0L
      md.update(ws.getUTF8String(i).getBytes)
      val d = md.digest() // digest() resets the instance for the next token
      val h = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
      var b = 0
      while (b < 16) { ones(b) += (h >> b) & 1; b += 1 }
      i += 1
    }
    // vote(b) = 2*ones(b) - n > 0  ⟺  2*ones(b) > n
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (2 * ones(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }
}
