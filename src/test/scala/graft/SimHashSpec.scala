package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.SimHash16
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native simhash16 kernel must be bit-identical to the composed
  * HOF form it replaced (d4's original expression) — that equivalence
  * is what keeps the DuckDB oracle valid.
  */
class SimHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // d4's ORIGINAL composed form, kept verbatim as the reference:
  // per bit b, vote = Σ ((conv(substr(md5(t),1,4),16,10) >> b) & 1)*2-1
  private val hofSimhash =
    """aggregate(sequence(0, 15), cast(0 as bigint), (acc, b) -> acc +
      |  if(aggregate(transform(ws, t -> (shiftright(cast(conv(substring(md5(t), 1, 4), 16, 10) as bigint), b) & 1) * 2 - 1),
      |              cast(0 as bigint), (a, x) -> a + x) > 0,
      |     shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin

  test("kernel == composed HOF form on the real corpus (codegen path)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val df = d
      .withColumn("native", VectorFunctions.simHash16(col("ws")))
      .withColumn("hof", expr(hofSimhash))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() > 0)
    // signatures actually vary (guards a degenerate all-zero kernel)
    assert(df.select(countDistinct(col("native"))).head.getLong(0) > 1)
  }

  private def evalInterp(ws: Seq[String]): Any =
    SimHash16(Literal.create(ws, ArrayType(StringType)))
      .eval(InternalRow.empty)

  test("interpreted path matches codegen on sampled docs") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("native", VectorFunctions.simHash16(col("ws")))
      .orderBy("doc_id").limit(25).collect()
    rows.foreach { r =>
      assert(evalInterp(r.getSeq[String](1)) == r.getLong(2),
             s"interpreted mismatch at doc_id ${r.get(0)}")
    }
  }

  test("edge cases: empty array → 0, null element → 0, null array → null") {
    assert(evalInterp(Seq.empty) == 0L)
    assert(evalInterp(Seq("a", null, "b")) == 0L)
    assert(SimHash16(Literal.create(null, ArrayType(StringType)))
      .eval(InternalRow.empty) == null)
    // null-element parity with the composed form through a real plan
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", null, "b")), Tuple1(Seq.empty[String]))
      .toDF("ws")
      .withColumn("native", VectorFunctions.simHash16(col("ws")))
      .withColumn("hof", expr(hofSimhash))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native") =!= lit(0L)).count() == 0)
  }

  test("single token sets exactly its hash's bits") {
    // one token: every bit with hash-bit 1 has vote +1 > 0 → signature
    // equals the 16-bit token hash itself
    val got = evalInterp(Seq("hello")).asInstanceOf[Long]
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest("hello".getBytes("UTF-8"))
    val h = ((dg(0) & 0xFF) << 8) | (dg(1) & 0xFF)
    assert(got == h.toLong)
  }
}
