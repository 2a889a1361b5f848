package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native cdc_chunk_hashes kernel must reproduce the composed
  * declarative pipeline it replaced (sequence/explode boundary scan +
  * lead() chunk reconstruction + md5/length) chunk-for-chunk — that
  * equivalence is what keeps d18's DuckDB oracle valid after the swap
  * — and must hold identically on the interpreted (non-codegen) path.
  */
class CdcChunkHashesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic texts of varied length/content, plus edge shapes:
    * empty, shorter than one window, exactly one window, repetitive
    * (many boundaries colliding), and an edit-shifted copy.
    */
  private def textsDf = {
    import spark.implicits._
    val base = (0 until 120).map { i =>
      val words = (0 until (i % 37)).map(j => s"w${(i * 31 + j * 7) % 23}")
      (i.toLong, words.mkString(" "))
    }
    val edges = Seq(
      (1000L, ""), (1001L, "abc"), (1002L, "exactly8"),
      (1003L, "x" * 200), (1004L, "ab" * 100),
      (1005L, base(50)._2.patch(5, "INSERTED ", 0)))
    (base ++ edges).toDF("doc_id", "text")
  }

  /** The original composed pipeline, verbatim from d18's first cut. */
  private def composed(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text) - 7, 1))")).as("p"))
      .filter(col("p") === 1 ||
              expr("substring(md5(substring(text, p, 8)), 1, 1)") === "0")
      .withColumn("next_p",
        lead(col("p"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .select(col("doc_id"), col("p"),
        expr("substring(text, p, coalesce(next_p, length(text) + 1) - p)")
          .as("chunk"))
      .select(col("doc_id"), col("p"), md5(col("chunk")).as("h"),
        length(col("chunk")).as("len"))

  private def native(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        posexplode(VectorFunctions.cdcChunkHashes(col("text")))
          .as(Seq("i", "c")))
      .select(col("doc_id"), col("i"), col("c.h").as("h"),
        col("c.len").as("len"))

  test("native kernel == composed pipeline, chunk for chunk") {
    // compare ordered chunk sequences per doc (position-aligned via
    // the boundary rank, since p and i are both in document order)
    val c = composed(textsDf)
      .withColumn("i", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("p"))) - 1)
      .select("doc_id", "i", "h", "len")
    val n = native(textsDf)
    assert(c.count() == n.count())
    assert(c.except(n).count() == 0)
    assert(n.except(c).count() == 0)
    // not vacuous: multiple chunks exist and lengths vary
    assert(n.count() > 130)
    assert(n.select(countDistinct(col("len"))).head().getLong(0) > 3)
  }

  test("interpreted path (codegen disabled) matches") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val a = native(textsDf).collect().map(r => r.toSeq).toSet
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
      val b = native(textsDf).collect().map(r => r.toSeq).toSet
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("null text yields null; empty text yields one empty chunk") {
    import spark.implicits._
    val df = Seq((0L, null: String), (1L, ""))
      .toDF("doc_id", "text")
      .withColumn("c", VectorFunctions.cdcChunkHashes(col("text")))
      .select("doc_id", "c")
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1))
    val arr = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(arr.length == 1)
    // md5("") — the composed pipeline produced the same row
    assert(arr.head.getString(0) == "d41d8cd98f00b204e9800998ecf8427e")
    assert(arr.head.getInt(1) == 0)
  }

  test("multi-byte text uses code-point windows (matches composed)") {
    import spark.implicits._
    val df = Seq(
      (0L, "héllo wörld sömething lönger thän öne windöw hère ök"),
      (1L, "日本語のテキストでも同じ境界規則が成り立つはずです句読点も含む")
    ).toDF("doc_id", "text")
    val c = composed(df)
      .withColumn("i", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("p"))) - 1)
      .select("doc_id", "i", "h", "len")
    val n = native(df)
    assert(c.except(n).count() == 0 && n.except(c).count() == 0)
  }
}
