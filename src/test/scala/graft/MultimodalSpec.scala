package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** m6: the real-codec image round-trip. The oracle compare (DuckDB)
  * checks the same thing at the gate; this spec keeps the property
  * local — decode output must equal the closed-form pixel replay —
  * and additionally proves the bytes on disk are REAL PNGs (magic +
  * ImageIO round-trip), i.e. the query exercises an actual codec.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("m6 decoded stats equal the closed-form pixel replay") {
    val got = SparkEntry.queries("m6_image_decode")(spark, sf)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    // independent replay of the generator formula — never touches a
    // codec, mirrors the DuckDB oracle
    def chanSum(off: Int) = expr(
      s"""aggregate(sequence(0L, w*h - 1), 0L, (acc, i) ->
         |  acc + (doc_id*31 + 7*(i % w) + 13*(i div w) + $off) % 256)"""
        .stripMargin)
    val exp = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("w", lit(8L) + col("doc_id") % 25)
      .withColumn("h", lit(8L) + expr("doc_id div 7") % 25)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
           sum(col("w")).as("sum_width"), sum(col("h")).as("sum_height"),
           sum(chanSum(0)).as("sum_r"), sum(chanSum(101)).as("sum_g"),
           sum(chanSum(202)).as("sum_b"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty && got.sameElements(exp),
      s"decode drift:\n got=${got.toSeq}\n exp=${exp.toSeq}")
  }

  test("m7 decoded stats equal the closed-form sample replay") {
    val got = SparkEntry.queries("m7_audio_decode")(spark, sf)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    // independent replay of the generator formula — never touches the
    // codec, mirrors the DuckDB oracle
    val exp = graft.sources.Tables.documents(spark, sf)
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
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty && got.sameElements(exp),
      s"decode drift:\n got=${got.toSeq}\n exp=${exp.toSeq}")
  }

  test("the on-disk clips are genuine WAVs (RIFF magic + AudioSystem parse)") {
    SparkEntry.queries("m7_audio_decode")(spark, sf).count() // materialize files
    val dir = new java.io.File(
      graft.operators.Coverage.scratchDir("m7_wavs"))
    val wavs = dir.listFiles().filter(_.getName.endsWith(".wav"))
    assert(wavs.length > 0)
    val f = wavs.minBy(_.getName)
    val head = java.nio.file.Files.readAllBytes(f.toPath)
    assert(head.take(4).sameElements("RIFF".getBytes) &&
           head.slice(8, 12).sameElements("WAVE".getBytes),
      "missing RIFF/WAVE signature")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(f)
    val id = f.getName.stripSuffix(".wav").toLong
    assert(ais.getFrameLength == 64 + id % 128)
    assert(ais.getFormat.getSampleRate == 8000f)
  }

  test("the packed assets are genuine PNGs (magic bytes + ImageIO decode)") {
    // m6/m9 read the PACKED image fixture since r11 (the m10 lesson
    // applied to the image half); validate a member pulled back out of
    // the shard container, which also proves the pack round trip
    SparkEntry.queries("m6_image_decode")(spark, sf).count() // materialize pack
    val dir = graft.operators.Coverage.scratchDir("m6_png_shards")
    val (id, bytes) = graft.sources.MediaShards
      .readMembers(spark, dir, Nil).orderBy("_1").head()
    assert(bytes.take(8).sameElements(
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)),
      "missing PNG signature")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == (8 + id % 25).toInt)
    assert(img.getHeight == (8 + (id / 7) % 25).toInt)
  }

  test("WAV codec calls go through the held SPI providers, never AudioSystem") {
    // the r12 finding: AudioSystem's entry points serialize every
    // caller on a synchronized static provider registry — 5000 decodes
    // measured 0.17 s on one thread but 0.45 s on four. WavCodec holds
    // the SPI providers per JVM instead; this lint keeps a future edit
    // from reintroducing the global lock into the decode hot loop. The
    // only permitted AudioSystem CALLS in Multimodal.scala are
    // WavCodec's own two fallback lines (exotic payloads).
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/operators/Multimodal.scala")), "UTF-8")
    val calls = src.linesIterator.zipWithIndex.filter { case (l, _) =>
      val code = l.takeWhile(_ != '/') // strip line comments; scaladoc
      // lines start with spaces + '*' and never carry code
      !l.trim.startsWith("*") && code.contains("AudioSystem.")
    }.toSeq
    assert(calls.size == 2,
      s"expected exactly WavCodec's 2 AudioSystem fallback call sites, " +
        s"found ${calls.size}: lines ${calls.map(_._2 + 1).mkString(",")}")
    calls.foreach { case (l, i) =>
      assert(l.contains("getAudioInputStream") || l.contains("write("),
        s"unexpected AudioSystem usage at line ${i + 1}: $l")
    }
  }
}
