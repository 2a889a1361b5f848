package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c30's zone-map mechanism: the manifest prune must (a) actually
  * skip non-overlapping files — the scan's inputFiles are the proof —
  * and (b) return exactly what a full scan + filter returns.
  */
class StatsSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zone-overlap prune scans 1 of 4 files and matches the full scan") {
    val dir = Files.createTempDirectory("graft-c30").toString
    val docs = (0L until 400L)
      .map(i => (i, s"src${i % 5}", 10 + (i % 7)))
      .toDF("doc_id", "source", "n_chars")
    (0 until 4).foreach { b =>
      docs.filter(col("doc_id") >= b * 100 && col("doc_id") < (b + 1) * 100)
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    assert(spark.read.parquet(dir).inputFiles.length == 4)
    // query range [130, 170] lives entirely in file 1 (100..199)
    val pruned = graft.operators.Coverage.statsPrunedScan(spark, dir, 130L, 170L)
    assert(pruned.inputFiles.length == 1,
      s"expected 1 surviving file, scanned ${pruned.inputFiles.toSeq}")
    val full = spark.read.parquet(dir)
      .filter(col("doc_id").between(130L, 170L))
      .select("doc_id", "source", "n_chars")
    val got = pruned.select("doc_id", "source", "n_chars")
    assert(got.count() == 41)
    assert(got.except(full).count() == 0 && full.except(got).count() == 0)
  }

  test("a range spanning two zones scans exactly those two files") {
    val dir = Files.createTempDirectory("graft-c30b").toString
    val docs = (0L until 200L).map(i => (i, "s", 1)).toDF("doc_id", "source", "n_chars")
    (0 until 4).foreach { b =>
      docs.filter(col("doc_id") >= b * 50 && col("doc_id") < (b + 1) * 50)
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    val pruned = graft.operators.Coverage.statsPrunedScan(spark, dir, 45L, 55L)
    assert(pruned.inputFiles.length == 2)
    assert(pruned.count() == 11)
  }
}
