package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Dump-catalog operations (kafka_client.py:259-298): the catalog is a
  * filesystem prefix tree (`s3a://bucket/kafka-topic-dumper-data/` or
  * any Hadoop-FS path — scheme-agnostic so tests run on local FS, and
  * prod runs on S3A where the reference used boto3 paginated listings).
  */
class DumpCatalog(root: String, conf: Configuration) {
  private def fs: FileSystem = FileSystem.get(new java.net.URI(root), conf)

  /** List dump ids = child directory names (S6). Hidden/metadata dirs
    * (`_state`, `_temporary`, dotfiles — Hadoop convention) are not
    * dumps and must not win the lexicographic-latest race.
    */
  def dumpIds(): Seq[String] = {
    val p = new HPath(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSeq
  }

  /** Latest dump = lexicographic max (kafka_client.py:275): dump ids
    * are `yyyyMMddHHmmss` timestamps, so string max == newest (A1).
    */
  def latestDumpId(): Option[String] = dumpIds().maxOption

  /** Files of one dump, lexicographically sorted = consumption order
    * (S7, kafka_client.py:291). Empty → error, like EmptyS3Response.
    */
  def dumpFiles(dumpId: String): Seq[String] = {
    val files = fs.listStatus(new HPath(root, dumpId))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).sorted.toSeq
    if (files.isEmpty)
      throw new IllegalStateException(s"empty dump: $root/$dumpId")
    files
  }

  def dumpPath(dumpId: String): String = s"$root/$dumpId"
}

object DumpCatalog {
  /** UTC `yyyyMMddHHmmss` dump id (main.py:107-110). */
  def newDumpId(epochMillis: Long = System.currentTimeMillis()): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochMilli(epochMillis))
  }
}
