// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see CosineSimilarity, SimHash16, MinHash8).
package org.apache.spark.sql.graftnative

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash — the repo-wide deterministic token hash
  * `cast(conv(substring(md5(x), 1, nibbles), 16, 10) as bigint)`
  * (d8/d11's 60-bit shingle tokens, and the shared 15-nibble form
  * d5/d16 adopted this round) computed in ONE digest call: the top
  * `4·nibbles` bits of the MD5 digest read big-endian, exactly the
  * value the hex-substring-parse chain produces, without allocating
  * the 32-char hex string or running conv's radix parse per token.
  * The DuckDB oracles keep replaying the composed SQL form — values
  * are bit-identical by construction (Md5PrefixSpec pins it).
  *
  * `nibbles` must be ≤ 15 so the value stays inside a positive signed
  * long, matching conv's behavior on these widths.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nibbles >= 1 && nibbles <= 15,
    s"md5_prefix wants 1..15 nibbles, got $nibbles")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(a: Any): Any =
    Md5PrefixOps.prefix(a.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.Md5PrefixOps" +
        s".prefix($a, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object Md5PrefixOps {
  // one digest instance per thread, reset per call — getInstance's
  // provider lookup + allocation is measurable at per-token call rates
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Top `4·nibbles` bits of md5(s) as an unsigned big-endian value —
    * ≡ parsing the first `nibbles` hex chars of the digest.
    */
  def prefix(s: UTF8String, nibbles: Int): Long = {
    val m = md.get()
    m.update(s.getBytes)
    val d = m.digest() // digest() resets the instance for the next call
    // first 8 digest bytes as a big-endian long, then keep the top
    // nibbles: hex char k (0-based) is bit slice [60-4k, 64-4k) of
    // this value
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> (64 - 4 * nibbles)
  }
}
