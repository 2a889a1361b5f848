package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dump side of the pipeline (kafka_client.py:207-257): records →
  * size-bounded gzip Parquet files under <dest>/<dumpId>/ with the
  * reference's deterministic names `{dumpId}-{cumulative:015d}.parquet`
  * and its positional `"0"`(key)/`"1"`(value) binary schema
  * (FIXTURES.md A2), so lexicographic file sort == record order.
  *
  * Scale shape: ONE distributed write job. Records are range-
  * partitioned and sorted on (partition, offset) so part files come
  * out in global order, `maxRecordsPerFile` bounds file size, and a
  * driver-side O(#files) rename pass applies the cumulative naming
  * (parquet footers give row counts without data reads — SURVEY.md §7
  * hard-part 1). No per-row driver work at any scale.
  */
class Dumper(spark: SparkSession) {

  /** @param records   DataFrame with `key`,`value` binary columns plus
    *                   ordering columns (default: partition, offset)
    * @param maxPerFile max rows per parquet file (reference -m flag)
    * @return file names in order
    */
  def dump(
      records: DataFrame,
      destDir: String,
      dumpId: String,
      maxPerFile: Int,
      orderCols: Seq[String] = Seq("partition", "offset")): Seq[String] = {
    val out = s"$destDir/$dumpId"
    val ordered = {
      val oc = orderCols.map(col)
      val n = math.max(spark.sessionState.conf.numShufflePartitions, 1)
      records.repartitionByRange(n, oc: _*).sortWithinPartitions(oc: _*)
    }
    ordered
      .select(col("key").as("0"), col("value").as("1"))
      .write.mode("overwrite")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxPerFile.toLong)
      .parquet(out)
    renameToCumulative(out, dumpId)
  }

  /** Compact a dump's small files into at-most-`maxPerFile`-row files,
    * preserving both catalog invariants (lexicographic file order ==
    * record order; cumulative `%015d` naming). Order is recovered
    * from (file name, within-file position): dump files are written
    * as one row group each and are smaller than a split, so one task
    * reads a whole file and `monotonically_increasing_id` is
    * ascending within it. The rewrite is a distributed job; the swap
    * is a driver-side O(#files) rename (compaction is an offline
    * maintenance op, run it when no reader races the swap).
    *
    * The 100 TB point: a long-running dumper accumulates
    * files-per-trigger small files; compaction bounds file count (and
    * thus listing and task-scheduling overhead for every later read)
    * without breaking the reload contract.
    */
  def compact(destDir: String, dumpId: String, maxPerFile: Int): Seq[String] = {
    val dir = s"$destDir/$dumpId"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val df = spark.read.parquet(dir)
      .withColumn("__f", input_file_name())
      .withColumn("__i", monotonically_increasing_id())
    val n = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val tmp = s"$destDir/.$dumpId-compacting"
    fs.delete(new HPath(tmp), true)
    df.repartitionByRange(n, col("__f"), col("__i"))
      .sortWithinPartitions(col("__f"), col("__i"))
      .select(col("0"), col("1"))
      .write.mode("overwrite")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxPerFile.toLong)
      .parquet(tmp)
    val names = renameToCumulative(tmp, dumpId)
    if (!fs.delete(new HPath(dir), true))
      throw new java.io.IOException(s"delete failed: $dir")
    if (!fs.rename(new HPath(tmp), new HPath(dir)))
      throw new java.io.IOException(s"rename failed: $tmp -> $dir")
    names
  }

  /** Rename part-* files (lexicographic = global row order after the
    * range partition + sort) to `{dumpId}-{cumulative:015d}.parquet`.
    */
  private def renameToCumulative(dir: String, dumpId: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val parts = fs.listStatus(new HPath(dir))
      .filter(f => f.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    var cumulative = 0L
    val names = for (f <- parts) yield {
      val name = f"$dumpId-$cumulative%015d.parquet"
      // FileSystem.rename reports failure by RETURNING false, not
      // throwing — a silently-kept part-* name would corrupt the
      // lexicographic-order contract
      if (!fs.rename(f.getPath, new HPath(dir, name)))
        throw new java.io.IOException(s"rename failed: ${f.getPath} -> $dir/$name")
      cumulative += footerRowCount(fs, new HPath(dir, name))
      name
    }
    names.toSeq
  }

  /** Row count from the parquet footer (metadata-only read). */
  private def footerRowCount(fs: FileSystem, p: HPath): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(p, fs.getConf)
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
