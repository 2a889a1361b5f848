// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// surfaces (sessionState.functionRegistry) — same pattern as the
// sibling native expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  ByteType, IntegerType, LongType, ShortType, StringType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator (UDTF surface): `shingles(text, n)` emits the
  * n-word shingles of whitespace-tokenized text, one row each — the
  * reference's 1→0..n Transformer protocol (transformer.py:4-5)
  * expressed as a Catalyst table function rather than a typed
  * flatMap, so it composes in SQL and the DataFrame DSL alike and
  * plans as a pipelined `Generate` node (no shuffle, no buffering).
  *
  * Tokenization and the short-text case (< n tokens → ONE shingle of
  * the whole text) bit-match the composed `shinglesExpr` in
  * operators.Dedup, so the two forms are interchangeable under the
  * DuckDB oracle.
  */
case class Shingles(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)
  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  /** Analysis-time contract: executor-side eval would otherwise fail
    * with ClassCastException on a mistyped argument; surface it as a
    * driver-side AnalysisException instead.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingles() first argument must be STRING, got ${text.dataType.sql}")
    else n.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingles() width must be an integer, got ${other.sql}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val nv = n.eval(input)
    // null text, null width, or a non-positive width yield no shingles
    // (mirrors how explode treats null/empty arrays) rather than an
    // executor-side NPE / sliding() IllegalArgumentException
    if (t == null || nv == null) Iterator.empty
    else {
      val k = nv.asInstanceOf[Number].intValue()
      if (k <= 0) Iterator.empty
      else {
        val toks = t.asInstanceOf[UTF8String].toString.trim
          .split("\\s+").filterNot(_.isEmpty)
        val shingles =
          if (toks.length < k) Iterator.single(toks.mkString(" "))
          else toks.sliding(k).map(_.mkString(" "))
        shingles.map(sh => InternalRow(UTF8String.fromString(sh)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Shingles =
    copy(text = newChildren(0), n = newChildren(1))
}

object ShinglesApi {
  /** Idempotently register `shingles` on sessions not built with
    * GraftExtensions (the driver's Verify/Bench sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "shingles", exprs => Shingles(exprs(0), exprs(1)), "built-in")
}
