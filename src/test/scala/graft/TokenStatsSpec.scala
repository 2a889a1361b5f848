package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.TokenStats
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native token_stats kernel must be bit-identical to the
  * composed HOF forms it replaced (t11/t14/t16's Gopher-rule
  * metrics) — that equivalence is what keeps their DuckDB oracles
  * valid.
  */
class TokenStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // the ORIGINAL composed forms, verbatim
  private val topCnt =
    "array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))"
  // guarded exactly as the queries guard it (n < 2 short-circuits
  // before the sequence/element_at are ever evaluated)
  private val dup2Distinct =
    """if(size(ws) < 2, 0,
      |   size(array_distinct(
      |     transform(sequence(1, size(ws) - 1),
      |               i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1))))))""".stripMargin
  private val coll =
    """aggregate(
      |  transform(array_distinct(ws),
      |            w -> cast(size(filter(ws, x -> x = w)) as bigint)),
      |  0L, (a, c) -> a + c * c)""".stripMargin

  test("kernel == composed HOF forms on the real corpus (codegen path)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("ts", VectorFunctions.tokenStats(col("ws")))
    val df = d
      .withColumn("h_top", expr(topCnt))
      .withColumn("h_dup2", expr(dup2Distinct))
      .withColumn("h_dist", expr("size(array_distinct(ws))"))
      .withColumn("h_coll", expr(coll))
    assert(df.count() > 0)
    assert(df.filter(col("ts.top_cnt") =!= col("h_top")).count() == 0)
    // dup2Distinct's sequence(1, n-1) is only well-formed for n >= 2
    // (the queries guard on it); compare there
    assert(df.filter(size(col("ws")) >= 2 &&
             col("ts.dup2_distinct") =!= col("h_dup2")).count() == 0)
    assert(df.filter(col("ts.distinct_cnt") =!= col("h_dist")).count() == 0)
    assert(df.filter(col("ts.coll") =!= col("h_coll")).count() == 0)
    // stats actually vary (guards a degenerate kernel)
    assert(df.select(countDistinct(col("ts.coll"))).head.getLong(0) > 1)
  }

  private def evalInterp(ws: Seq[String]): InternalRow =
    TokenStats(Literal.create(ws, ArrayType(StringType)))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]

  test("interpreted path matches codegen on sampled docs") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("ts", VectorFunctions.tokenStats(col("ws")))
      .select(col("doc_id"), col("ws"), col("ts.top_cnt"),
              col("ts.dup2_distinct"), col("ts.distinct_cnt"), col("ts.coll"))
      .orderBy("doc_id").limit(25).collect()
    rows.foreach { r =>
      val got = evalInterp(r.getSeq[String](1))
      assert(got.getInt(0) == r.getInt(2) && got.getInt(1) == r.getInt(3) &&
             got.getInt(2) == r.getInt(4) && got.getLong(3) == r.getLong(5),
             s"interpreted mismatch at doc_id ${r.get(0)}")
    }
  }

  test("edge cases: null tokens, empty array, null array") {
    // null token: +1 distinct (array_distinct keeps one null), count
    // list gains a 0 (x = null never true), bigrams skip the null
    // (concat_ws) — parity with the composed forms through a real plan
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", null, "a", "b")),
                 Tuple1(Seq[String](null, null)),
                 Tuple1(Seq("only")))
      .toDF("ws")
      .withColumn("ts", VectorFunctions.tokenStats(col("ws")))
      .withColumn("h_top", expr(topCnt))
      .withColumn("h_dup2", expr(dup2Distinct))
      .withColumn("h_dist", expr("size(array_distinct(ws))"))
      .withColumn("h_coll", expr(coll))
    assert(df.filter(not(col("ts.top_cnt") <=> col("h_top"))).count() == 0)
    assert(df.filter(size(col("ws")) >= 2 &&
             not(col("ts.dup2_distinct") <=> col("h_dup2"))).count() == 0)
    assert(df.filter(not(col("ts.distinct_cnt") <=> col("h_dist"))).count() == 0)
    assert(df.filter(not(col("ts.coll") <=> col("h_coll"))).count() == 0)
    // empty array: top_cnt NULL (array_max of nothing), rest zero
    val empty = evalInterp(Seq.empty)
    assert(empty.isNullAt(0) && empty.getInt(1) == 0 &&
           empty.getInt(2) == 0 && empty.getLong(3) == 0L)
    // null array propagates
    assert(TokenStats(Literal.create(null, ArrayType(StringType)))
      .eval(InternalRow.empty) == null)
  }
}
