// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see CosineSimilarity, SortedIntersectSize).
package org.apache.spark.sql.graftnative

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass content-defined-chunking kernel for d18: emits each
  * document's CDC chunks as `array<struct<h: string, len: int>>` — the
  * md5 hex of every chunk plus its char length.
  *
  * Semantics are EXACTLY the composed pipeline it replaces (and the
  * DuckDB oracle still replays): position p (1-based) in
  * 1..greatest(len-7, 1) starts a chunk iff p = 1 or the md5 of the
  * 8-char window text[p, p+8) begins with hex nibble 0 (a 1-in-16
  * boundary), and each chunk spans [p, next_p).
  *
  * Why native: the declarative form explodes one row per CHARACTER
  * (sequence + explode), evaluates substring+md5 per position through
  * Catalyst's expression machinery, then pays a doc-keyed window
  * (lead) shuffle just to pair each boundary with the next. This
  * kernel runs the whole scan per row inside one generated call —
  * no row blowup, no shuffle before the chunk grain — with an
  * ASCII fast path that slides over the UTF-8 bytes directly
  * (zero per-window allocation beyond the 16-byte digest).
  *
  * Non-ASCII text falls back to code-point windows (String.substring),
  * matching Spark's character-based `substring` semantics.
  */
case class CdcChunkHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = CdcOps.outType
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(t: Any): Any =
    CdcOps.chunkHashes(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graftnative.CdcOps.chunkHashes($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object CdcOps {
  val outType: ArrayType = ArrayType(
    StructType(
      StructField("h", StringType, nullable = false) ::
      StructField("len", IntegerType, nullable = false) :: Nil),
    containsNull = false)

  private val WINDOW = 8
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def chunkHashes(t: UTF8String): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val bytes = t.getBytes
    val nBytes = bytes.length
    val nChars = t.numChars()
    if (nBytes == nChars) {
      // ASCII fast path: char position == byte position; windows and
      // chunk digests run directly over the byte array.
      val last = math.max(nChars - (WINDOW - 1), 1) // last window start, 1-based
      val bounds = new java.util.ArrayList[Integer]()
      bounds.add(1)
      var p = 2
      while (p <= last) {
        md.update(bytes, p - 1, WINDOW)
        // digest() resets the instance for the next window
        if ((md.digest()(0) & 0xF0) == 0) bounds.add(p)
        p += 1
      }
      val nb = bounds.size()
      val rows = new Array[Any](nb)
      var i = 0
      while (i < nb) {
        val start = bounds.get(i).intValue()
        val end = if (i + 1 < nb) bounds.get(i + 1).intValue() else nChars + 1
        md.update(bytes, start - 1, end - start)
        rows(i) = InternalRow(hex(md.digest()), end - start)
        i += 1
      }
      new GenericArrayData(rows)
    } else {
      // code-point path: mirror Spark's character-based substring
      val s = t.toString
      val len = s.codePointCount(0, s.length)
      def cpSub(from: Int, count: Int): String = { // 1-based code points
        val a = s.offsetByCodePoints(0, from - 1)
        val b = s.offsetByCodePoints(a, count)
        s.substring(a, b)
      }
      val last = math.max(len - (WINDOW - 1), 1)
      val bounds = new java.util.ArrayList[Integer]()
      bounds.add(1)
      var p = 2
      while (p <= last) {
        md.update(cpSub(p, WINDOW).getBytes(StandardCharsets.UTF_8))
        if ((md.digest()(0) & 0xF0) == 0) bounds.add(p)
        p += 1
      }
      val nb = bounds.size()
      val rows = new Array[Any](nb)
      var i = 0
      while (i < nb) {
        val start = bounds.get(i).intValue()
        val end = if (i + 1 < nb) bounds.get(i + 1).intValue() else len + 1
        val chunk = cpSub(start, end - start)
        md.update(chunk.getBytes(StandardCharsets.UTF_8))
        rows(i) = InternalRow(hex(md.digest()), end - start)
        i += 1
      }
      new GenericArrayData(rows)
    }
  }
}
