package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native two-pointer SortedIntersectSize must equal
  * size(array_intersect) on every sorted-distinct input — that
  * equivalence is what keeps d8's DuckDB oracle valid after the swap —
  * and must hold identically on the interpreted (non-codegen) path.
  */
class SortedIntersectSizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic sorted-distinct long arrays of varied density:
    * overlapping strided sequences exercise empty/partial/full overlap.
    */
  private def pairsDf = {
    import spark.implicits._
    val rows = for {
      i <- 0 until 40
      j <- 0 until 40
    } yield {
      val a = (0L until 60L).filter(v => (v + i) % (1 + i % 7) == 0).toArray
      val b = (0L until 60L).filter(v => (v + j) % (1 + j % 5) == 0).toArray
      (i * 40 + j, a, b)
    }
    rows.toDF("id", "a", "b")
  }

  test("native merge == size(array_intersect) over 1600 sorted pairs") {
    val df = pairsDf
      .withColumn("native", VectorFunctions.sortedIntersectSize(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("native") =!= col("ref")).count() == 0)
    assert(df.count() == 1600)
    // not vacuous: overlaps actually vary
    assert(df.select(countDistinct(col("native"))).head().getLong(0) > 5)
  }

  test("interpreted path (codegen disabled) matches") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = pairsDf
        .withColumn("native", VectorFunctions.sortedIntersectSize(col("a"), col("b")))
        .withColumn("ref", size(array_intersect(col("a"), col("b"))))
      assert(df.filter(col("native") =!= col("ref")).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("null array propagates null; empty arrays intersect to 0") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (2, Some(Array.empty[Long]), Some(Array(1L, 2L))),
      (3, Some(Array(1L, 2L)), Some(Array(2L, 3L))))
      .toDF("id", "a", "b")
      .withColumn("n", VectorFunctions.sortedIntersectSize(col("a"), col("b")))
    val got = df.select(col("id"), col("n")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got == Map(1 -> -1, 2 -> 0, 3 -> 1))
  }
}
