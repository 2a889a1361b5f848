package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.MediaShards

/** The packed-media container (sources.MediaShards) and its m11 driver.
  *
  * What must hold: (1) pack → read is a bit-exact round trip for every
  * member; (2) the layout really is packed — at most one shard file per
  * input partition, members back-to-back behind the magic header, so
  * the index fully accounts for every byte; (3) a filtered read touches
  * only requested members; (4) re-packing replaces the previous layout
  * rather than accreting orphan shards; (5) m11 (packed) produces the
  * same result as m7 (loose files) — one corpus, two layouts, one
  * answer.
  */
object MediaShardsSpec {
  // top-level object, not a suite method: the render closure ships to
  // executors and must not capture the (non-serializable) suite
  def render(id: Long): Array[Byte] = {
    // variable-length deterministic payload, never empty
    val n = (id % 97 + 1).toInt
    Array.tabulate[Byte](n)(i => ((id * 31 + i * 7) % 256).toByte)
  }
}

class MediaShardsSpec extends AnyFunSuite {
  import MediaShardsSpec.render
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name)
    p.toString
  }

  test("pack -> readMembers round-trips every member bit-exactly") {
    import spark.implicits._
    val dir = freshDir("gshard")
    val ids = spark.range(0, 500).select(col("id").as("doc_id"))
      .repartition(7)
    MediaShards.pack(spark, ids, dir)(render)
    val back = MediaShards.readMembers(spark, dir).collect().toMap
    assert(back.size == 500)
    (0L until 500L).foreach { id =>
      assert(java.util.Arrays.equals(back(id), render(id)),
        s"member $id corrupted by the pack/read round trip")
    }
  }

  test("readMembers keeps decode parallelism: one partition per core, balanced") {
    // the r12 m9 regression: a count-less repartition of the few-KB
    // offset index was REPARTITION_BY_COL, which AQE coalesced to ONE
    // task — the downstream per-member decode (invisible to AQE) ran
    // single-core. Pin the fixed behavior: the member stream must
    // come back in exactly defaultParallelism partitions with no
    // partition holding more than ~2x its fair share, whatever AQE
    // thinks of the index shuffle's size.
    import spark.implicits._
    val dir = freshDir("gshard")
    val ids = spark.range(0, 800).select(col("id").as("doc_id"))
      .repartition(5)
    MediaShards.pack(spark, ids, dir)(render)
    val sizes = MediaShards.readMembers(spark, dir).rdd
      .mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().map(_._2)
    val p = spark.sparkContext.defaultParallelism
    assert(sizes.length == p,
      s"member read came back in ${sizes.length} partitions, wanted $p " +
        "(AQE coalescing re-broke the decode parallelism?)")
    val fair = 800.0 / p
    assert(sizes.max <= 2 * fair + 16,
      s"unbalanced member partitions: ${sizes.mkString(",")}")
  }

  test("the layout is packed: one shard per partition, bytes fully indexed") {
    import spark.implicits._
    val dir = freshDir("gshard")
    MediaShards.pack(spark,
      spark.range(0, 300).select(col("id").as("doc_id")).repartition(5),
      dir)(render)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard-")).sortBy(_.getName)
    assert(shards.length == 5, s"expected 5 shards, got ${shards.length}")
    val idx = spark.read.parquet(s"$dir/index.parquet")
      .as[MediaShards.Member].collect()
    assert(idx.length == 300)
    // per shard: members tile the file contiguously behind the header
    idx.groupBy(_.shard).foreach { case (name, ms) =>
      val sorted = ms.sortBy(_.offset)
      var expect = MediaShards.Magic.length.toLong
      sorted.foreach { m =>
        assert(m.offset == expect,
          s"$name: gap/overlap at member ${m.doc_id}")
        expect += m.length
      }
      val f = new java.io.File(dir, name)
      assert(f.length() == expect,
        s"$name: file has ${f.length()} bytes, index accounts for $expect")
    }
  }

  test("a member filter reads only the selected assets") {
    val dir = freshDir("gshard")
    MediaShards.pack(spark,
      spark.range(0, 200).select(col("id").as("doc_id")).repartition(4),
      dir)(render)
    val got = MediaShards.readMembers(spark, dir)
      .filter(col("_1") % 50 === 0).collect().toMap
    assert(got.keySet == Set(0L, 50L, 100L, 150L))
    got.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(bytes, render(id)))
    }
  }

  test("re-packing replaces the layout (no orphan shards)") {
    val dir = freshDir("gshard")
    MediaShards.pack(spark,
      spark.range(0, 100).select(col("id").as("doc_id")).repartition(8),
      dir)(render)
    // narrower second pack: stale shard-00005..07 must not survive
    MediaShards.pack(spark,
      spark.range(0, 100).select(col("id").as("doc_id")).repartition(2),
      dir)(render)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard-"))
    assert(shards.length == 2, s"orphan shards: ${shards.map(_.getName).toSeq}")
    assert(MediaShards.readMembers(spark, dir).count() == 100)
  }

  test("an empty corpus packs to an empty index and no shard files") {
    val dir = freshDir("gshard")
    MediaShards.pack(spark,
      spark.range(0, 0).select(col("id").as("doc_id")), dir)(render)
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.startsWith("shard-")))
    assert(MediaShards.readMembers(spark, dir).count() == 0)
  }

  test("a garbage container is rejected by the magic check") {
    val dir = freshDir("gshard")
    MediaShards.pack(spark,
      spark.range(0, 10).select(col("id").as("doc_id")).repartition(1),
      dir)(render)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard-")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    bytes(0) = 'X'.toByte
    java.nio.file.Files.write(shard.toPath, bytes)
    val ex = intercept[org.apache.spark.SparkException] {
      MediaShards.readMembers(spark, dir).count()
    }
    assert(ex.getMessage.contains("GSHARD1") ||
      Option(ex.getCause).exists(_.getMessage.contains("GSHARD1")))
  }

  test("the member predicate reaches the index scan as a pushed filter") {
    // m12's selection surface: pruning must happen at the parquet
    // index (row-group stats), not as a post-scan filter over all
    // members — at 100 TB "read 5% of the media" must not list/scan
    // 100% of the index rows, let alone the assets
    val plan = SparkEntry.queries("m12_shard_pruned")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(doc_id,250)"),
      s"doc_id predicate not pushed to the index scan:\n$plan")
  }

  test("m12 (pruned) equals m7's rollup over the filtered subset") {
    val m12 = SparkEntry.queries("m12_shard_pruned")(spark, sf)
      .orderBy("source").collect().map(_.toSeq)
    // the closed-form replay under the same predicate (m7's query has
    // no filter hook, so the comparison re-derives from the corpus)
    val expDf = {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") < 250)
        .select(col("doc_id"), col("source"))
        .withColumn("n", lit(64L) + col("doc_id") % 128)
        .withColumn("xs", expr(
          "transform(sequence(0L, n - 1), i -> (doc_id*37 + i*17) % 4096 - 2048)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_clips"),
             sum(col("n")).as("n_samples"),
             sum(expr("aggregate(xs, 0L, (a, x) -> a + x)")).as("sum_amp"),
             sum(expr("aggregate(xs, 0L, (a, x) -> a + abs(x))")).as("sum_abs"),
             max(expr("array_max(xs)")).as("max_amp"),
             min(expr("array_min(xs)")).as("min_amp"))
        .orderBy("source").collect().map(_.toSeq)
    }
    assert(m12.nonEmpty && m12.toSeq == expDf.toSeq,
      s"pruned-read drift:\n got=${m12.toSeq}\n exp=${expDf.toSeq}")
  }

  test("m11 (packed) equals m7 (loose files): one corpus, one answer") {
    val m7 = SparkEntry.queries("m7_audio_decode")(spark, sf)
      .orderBy("source").collect().map(_.toSeq)
    val m11 = SparkEntry.queries("m11_media_shards")(spark, sf)
      .orderBy("source").collect().map(_.toSeq)
    assert(m7.nonEmpty && m7.toSeq == m11.toSeq,
      s"layout drift:\n loose=${m7.toSeq}\n packed=${m11.toSeq}")
  }
}
