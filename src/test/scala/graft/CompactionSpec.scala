package graft

import java.nio.file.Files
import graft.pipeline.{DumpCatalog, Dumper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dump compaction: fewer files, same rows in the same order, both
  * catalog invariants (lexicographic order, cumulative naming) intact.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact merges small files preserving order and naming") {
    val root = Files.createTempDirectory("graft-compact").toString
    val records = (0 until 300).map { i =>
      (f"k$i%05d", f"v$i%05d", i % 4, i.toLong)
    }.toDF("ks", "vs", "partition", "offset")
      .select(encode(col("ks"), "UTF-8").as("key"),
              encode(col("vs"), "UTF-8").as("value"),
              col("partition"), col("offset"))
    val dumper = new Dumper(spark)
    val before = dumper.dump(records, root, "cd01", maxPerFile = 20,
                             orderCols = Seq("offset"))
    assert(before.size == 300 / 20 || before.size > 3) // many small files

    def readOrder(): Seq[String] = {
      val cat = new DumpCatalog(root, spark.sparkContext.hadoopConfiguration)
      cat.dumpFiles("cd01").sorted.flatMap { f =>
        spark.read.parquet(s"$root/cd01/$f")
          .select(decode(col("0"), "UTF-8"))
          .collect().map(_.getString(0)).toSeq
      }
    }
    val orderBefore = readOrder()
    assert(orderBefore.size == 300)

    val after = new Dumper(spark).compact(root, "cd01", maxPerFile = 100)
    assert(after.size < before.size, s"${after.size} !< ${before.size}")
    // naming + order invariants
    assert(after == after.sorted)
    assert(after.forall(_.matches("cd01-\\d{15}\\.parquet")))
    assert(after.head == "cd01-000000000000000.parquet")
    // same rows, same global order
    assert(readOrder() == orderBefore)

    // RE-compaction with input files bigger than a scan split: the
    // compacted files (100 rows) now read as multiple splits when the
    // split size is tiny — the _metadata-based order recovery must
    // still give the original record order (input_file_name +
    // monotonically_increasing_id would scramble it here)
    val prevSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val again = new Dumper(spark).compact(root, "cd01", maxPerFile = 300)
      assert(again.nonEmpty && again == again.sorted)
      assert(readOrder() == orderBefore)
      // the swap left no transient dirs behind
      val left = new java.io.File(root).list().toSeq
      assert(left == Seq("cd01"), s"leftover dirs: $left")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }
}
