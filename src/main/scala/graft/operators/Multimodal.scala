package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in distributed batch passes.
  *
  * No image/audio codecs exist in this environment (SURVEY.md builder
  * contract), so the DECODE step is a deterministic fake — derived
  * only from blob bytes — while everything Spark-side is real: binary
  * column handling, typed Dataset mapPartitions (the Scala analog of
  * mapInPandas batch UDFs), schema of the decoded struct, partition
  * behavior, and frame-sampling explode. Swapping the fake for a real
  * codec changes one function body, no plan shape.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Binary payload per doc: utf-8 bytes of text stand in for an
    * encoded image; metadata travels alongside.
    */
  case class Blob(doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)
  case class Decoded(doc_id: Long, source: String, width: Int, height: Int,
                     n_frames: Int, payload_bytes: Int)

  /** Deterministic fake decode: dims derived from blob bytes only.
    * A real decoder (JPEG header parse, ffprobe, …) replaces this body.
    */
  private[operators] def fakeDecode(b: Blob): Decoded = {
    val first = if (b.payload.nonEmpty) b.payload(0) & 0xff else 0
    Decoded(
      doc_id = b.doc_id,
      source = b.source,
      width = 16 + b.payload.length % 64,
      height = 16 + first % 64,
      n_frames = 1 + (b.n_chars % 8).toInt,
      payload_bytes = b.payload.length)
  }

  /** Blob extraction + decode pass via typed mapPartitions —
    * batch-shaped (iterator in/out, one decoder init per partition),
    * exactly how a native decoder would be driven at scale. Shared by
    * m1 and m3 so their decode semantics cannot drift apart.
    */
  private def decoded(s: SparkSession, d: String) = {
    import s.implicits._
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
              col("source"), col("n_chars"))
      .as[Blob]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handle, etc.)
        it.map(fakeDecode)
      }
  }

  val m1DecodeMeta: Q = (s, d) =>
    decoded(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
           sum(col("width")).as("sum_width"),
           sum(col("height")).as("sum_height"),
           sum(col("payload_bytes")).as("sum_bytes"))

  /** Frame sampling: every 2nd frame index of each "video" exploded to
    * one row per frame — the batch shape of video-frame extraction.
    */
  val m2FrameSample: Q = (s, d) =>
    graft.sources.Tables.documents(s, d)
      .withColumn("n_frames", (lit(1) + col("n_chars") % 8).cast("int"))
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1, 2)")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled_frames"),
           max(col("frame_idx")).as("max_frame_idx"))

  /** Resize planning: target dims halved with a floor of 16 — pure
    * metadata arithmetic over the decoded struct (no shuffle).
    */
  val m3ResizePlan: Q = (s, d) =>
    decoded(s, d)
      .select(col("doc_id"),
              greatest(lit(16), (col("width") / 2).cast("int")).as("target_w"),
              greatest(lit(16), (col("height") / 2).cast("int")).as("target_h"))
      .groupBy(col("target_w"), col("target_h"))
      .agg(count(lit(1)).as("n_blobs"))

  case class Features(doc_id: Long, source: String,
                      h0: Int, h1: Int, h2: Int, h3: Int, char_sum: Long)

  /** Feature extraction pass: a fixed-size feature vector per blob
    * (4-bucket codepoint histogram + codepoint sum over the first 64
    * chars — the deterministic stand-in for an embedding model or
    * spectral features), computed in the same typed mapPartitions
    * batch shape as the decoder. Aggregated per source for the pin.
    */
  val m4FeatureExtract: Q = (s, d) => {
    import s.implicits._
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // per-partition model/extractor init would go here
        it.map { case (id, text, src) =>
          val cs = text.take(64).map(_.toInt)
          Features(id, src,
            cs.count(_ % 4 == 0), cs.count(_ % 4 == 1),
            cs.count(_ % 4 == 2), cs.count(_ % 4 == 3),
            cs.foldLeft(0L)(_ + _))
        }
      }
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
           sum(col("h0")).as("sum_h0"), sum(col("h1")).as("sum_h1"),
           sum(col("h2")).as("sum_h2"), sum(col("h3")).as("sum_h3"),
           sum(col("char_sum")).as("sum_chars"))
  }

  /** Raw-file ingestion via Spark's built-in `binaryFile` source — the
    * standard way a multimodal pipeline lands on-disk media (one file
    * per asset) in a DataFrame at scale. The query is the full
    * round-trip: dump each payload to a scratch file named by doc id
    * (executor-side foreachPartition — no driver loop; the same write
    * an asset-exporting sink performs), re-ingest the directory as
    * (path, length, content) rows, recover ids from filenames, join
    * the id back to its metadata (broadcastable — the re-ingested side
    * carries only parsed ids) and verify payload integrity per source
    * with byte totals + an md5 content digest. The oracle recomputes
    * everything straight from the documents table: a lossless file
    * round-trip is hash-identical.
    */
  val m5BinaryIngest: Q = (s, d) => {
    val out = Coverage.scratchDir("m5_files")
    // m5's fixture depends on the TEXT payload, not just ids — the
    // fingerprint folds a payload checksum in so a text change with
    // identical ids re-renders
    val fpRow = graft.sources.Tables.documents(s, d)
      .agg(count(lit(1)), sum(col("doc_id")),
           sum(crc32(encode(col("text"), "UTF-8")))).head()
    renderedOnce(out, s"payload:${fpRow.get(0)}:${fpRow.get(1)}:${fpRow.get(2)}") {
      val src = graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val p = s.sparkContext.defaultParallelism
      (if (src.rdd.getNumPartitions < p) src.repartition(p) else src)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, f"${r.getLong(0)}%012d.bin"),
              r.getAs[Array[Byte]](1))
          }
        }
    }
    val ingested = s.read.format("binaryFile").load(out)
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "^(\\d+)", 1)
          .cast("long").as("doc_id"),
        col("length"), col("content"))
    val meta = graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
    ingested.join(meta, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("length")).as("total_bytes"),
           min(md5(col("content"))).as("min_md5"))
  }

  case class ImgDecoded(doc_id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode — the one multimodal stage the fake codec above
    * does not cover. Both directions run the JDK's actual PNG codec
    * (`javax.imageio`, zero added dependencies):
    *
    *  ENCODE (executor-side, foreachPartition): each doc renders a real
    *  PNG whose dimensions and RGB pixels are a pure function of its
    *  doc_id — w = 8 + id%25, h = 8 + (id/7)%25, channel c of pixel
    *  (x,y) = (id*31 + 7x + 13y + 101c) mod 256 — written with
    *  `ImageIO.write(img, "png", …)`, one file per asset.
    *
    *  DECODE (typed mapPartitions, per-partition codec init): the files
    *  re-ingest through the `binaryFile` source and each payload goes
    *  through `ImageIO.read` — a real PNG header/IDAT/zlib decode, NOT
    *  a replay of the generator formula — extracting width, height and
    *  per-channel pixel sums from the decoded raster.
    *
    * PNG is lossless, so the oracle can recompute the exact same stats
    * straight from the documents table in SQL; any codec round-trip
    * corruption (dimension drift, channel-order swap, gamma mangling)
    * breaks the hash compare. This is the m-family's proof that the
    * mapPartitions plumbing drives a REAL codec, not only the
    * deterministic stand-in.
    */
  /** Render-once discipline for the scratch media fixtures (m5–m10):
    * every render is a pure function of the corpus (WAV/PNG bytes of
    * doc_id; m5's payload of text), so re-rendering thousands of
    * small files on every bench pass only re-measured the HOST's
    * small-file writeback, not the codec path the queries exist to
    * measure — the r8 "m10 +30% with no code change" drift was
    * exactly that (r9 diagnosis: the r7 binary reads the same
    * elevated number on today's host; the decode stage's task time is
    * >90% non-CPU file-I/O wait). A fingerprint marker makes the
    * fixture per-(JVM, corpus) idempotent — the d-family's
    * dup-membership / g-family's link-graph artifact discipline, and
    * Bench declares these queries `artifact_warm`. A corpus switch
    * re-fingerprints, clears the dir and re-renders; a failed render
    * leaves no marker, so the next call re-renders.
    */
  private def renderedOnce(out: String, fingerprint: String)
                          (render: => Unit): Unit = {
    val dir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(dir)
    val marker = dir.resolve("_RENDER_DONE") // "_" prefix: hidden to
    // Spark's file index, so the binaryFile re-ingest never sees it
    if (java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == fingerprint) return
    java.nio.file.Files.deleteIfExists(marker)
    // clear stale data files (a different corpus's ids would be
    // join-dropped downstream, but decoding them would still cost);
    // recursive because m11/m12's fixture contains a directory
    // (index.parquet) alongside its shard files
    val stale = java.nio.file.Files.list(dir)
    try stale.forEach { p =>
      if (!p.getFileName.toString.startsWith("_"))
        graft.sources.MediaShards.rmTree(p)
    } finally stale.close()
    render
    java.nio.file.Files.writeString(marker, fingerprint)
    ()
  }

  /** Corpus fingerprint for id-driven renders (WAV/PNG bytes are pure
    * functions of doc_id): row count + id sum, one columnar agg.
    */
  private def idFingerprint(s: SparkSession, d: String): String = {
    val r = graft.sources.Tables.documents(s, d)
      .agg(count(lit(1)), sum(col("doc_id"))).head()
    s"ids:${r.get(0)}:${r.get(1)}"
  }

  /** The render source, spread across executors: at small SFs the
    * documents parquet is ONE split, so the unrepartitioned
    * foreachPartition wrote every fixture file from a single task —
    * serial file creation is the asset-export anti-pattern (and at
    * sf0.1 it was 2.4 s of the m10 profile). At scale the source is
    * already many splits and the round-robin shuffle of bare ids is
    * bytes-trivial.
    */
  private def spreadIds(s: SparkSession, d: String) = {
    val ids = graft.sources.Tables.documents(s, d).select(col("doc_id"))
    val p = s.sparkContext.defaultParallelism
    if (ids.rdd.getNumPartitions < p) ids.repartition(p) else ids
  }

  /** Real PNG bytes for one asset, keyed on `key`: pixels are the
    * closed form every image oracle recomputes (w = 8+key%25,
    * h = 8+(key/7)%25, channel c at (x,y) = (key·31 + 7x + 13y + 101c)
    * mod 256). m6/m9 key on doc_id (every asset distinct); m8 keys on
    * doc_id % 64 (planted duplicate classes).
    */
  private def pngBytes(key: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = (8 + key % 25).toInt
    val h = (8 + (key / 7) % 25).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int = ((key * 31 + 7L * x + 13L * y + 101L * c) % 256).toInt
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The shared PACKED image fixture (one pack per corpus, reused by
    * m6 and m9) — the m10 lesson applied to the image half of the
    * family (r11): loose per-asset PNGs made m6/m8/m9's bench numbers
    * measure the host's small-file path (0.5-1.5 s epoch swings at
    * sf0.1), and at sf10 they would be 500k loose files, which is why
    * the image queries had no sf10 gate row. The packed layout is the
    * production shape AND removes that noise; m5 keeps the loose
    * `binaryFile` round trip deliberately (that query IS the
    * loose-ingest operator) and m7 keeps loose WAVs as the measured
    * layout A/B baseline (MEDIA_SHARDS.json).
    */
  private def packedPngMembers(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val out = Coverage.scratchDir("m6_png_shards")
    renderedOnce(out, idFingerprint(s, d)) {
      graft.sources.MediaShards.pack(s, spreadIds(s, d), out)(pngBytes)
    }
    graft.sources.MediaShards.readMembers(s, out, Nil)
  }

  val m6ImageDecode: Q = (s, d) => {
    import s.implicits._
    val decoded = packedPngMembers(s, d)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          ImgDecoded(id, w, h, sr, sg, sb)
        }
      }
    val meta = graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
    decoded.join(meta, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
           sum(col("width").cast("long")).as("sum_width"),
           sum(col("height").cast("long")).as("sum_height"),
           sum(col("sum_r")).as("sum_r"),
           sum(col("sum_g")).as("sum_g"),
           sum(col("sum_b")).as("sum_b"))
  }

  case class AugDecoded(doc_id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  case class AudioAug(doc_id: Long, n_samples: Int, sum_amp: Long,
                      sum_abs: Long)

  /** Deterministic audio augmentation through the REAL codec — m9's
    * audio twin: decode (`AudioSystem.getAudioInputStream`), TRIM the
    * first 16 samples and apply an integer inversion-halving gain
    * (v′ = −(v ÷ 2), truncating toward zero — exactly replayable,
    * unlike float gain), RE-ENCODE to RIFF/WAVE, decode AGAIN, and
    * report amplitude stats from the second decode: the oracle match
    * proves the augmented clip survives a full encode→decode round
    * trip bit-exactly. Same per-partition codec-init mapPartitions
    * shape as m7; the only exchange is the K-row per-source rollup.
    *
    * Reads the PACKED shard layout (packedWavMembers — the production
    * path m11 established; the r11 same-host r9-vs-r10 binary A/B
    * showed m10's apparent creep was host epoch, not code, and the
    * remaining ~1 s of its residency was the loose layout's per-open
    * cost, which m11 already measured at 2.2–3.2×). m7 deliberately
    * KEEPS the loose binaryFile read as the layout A/B baseline; the
    * clips are bit-identical either way (wavBytes is the single source
    * of truth), so the closed-form oracle is unchanged.
    */
  val m10AudioAugment: Q = (s, d) => {
    import s.implicits._
    packedWavMembers(s, d)
      .mapPartitions { it =>
        import javax.sound.sampled._
        it.map { case (id, bytes) =>
          val ais = WavCodec.read(bytes)
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          // trim 16 samples, gain v' = -(v / 2) (Java int division)
          val n2 = math.max(n - 16, 0)
          val aug = new Array[Byte](n2 * 2)
          var i = 0
          while (i < n2) {
            val v = ((pcm(2 * (i + 16)) & 0xff) |
                     (pcm(2 * (i + 16) + 1) << 8)).toShort.toInt
            val v2 = -(v / 2)
            aug(2 * i) = (v2 & 0xff).toByte
            aug(2 * i + 1) = ((v2 >> 8) & 0xff).toByte
            i += 1
          }
          // full WAV round trip of the AUGMENTED clip
          val bos = new java.io.ByteArrayOutputStream()
          WavCodec.writeWave(
            new AudioInputStream(
              new java.io.ByteArrayInputStream(aug), fmt, n2.toLong), bos)
          val back = WavCodec.read(bos.toByteArray)
          val pcm2 = back.readAllBytes()
          val m = pcm2.length / 2
          var (sum, sabs) = (0L, 0L)
          var j = 0
          while (j < m) {
            val v = ((pcm2(2 * j) & 0xff) | (pcm2(2 * j + 1) << 8)).toShort.toInt
            sum += v; sabs += math.abs(v)
            j += 1
          }
          AudioAug(id, m, sum, sabs)
        }
      }
      .join(graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_clips"),
           sum(col("n_samples").cast("long")).as("n_samples"),
           sum(col("sum_amp")).as("sum_amp"),
           sum(col("sum_abs")).as("sum_abs"))
  }

  /** Deterministic augmentation through the REAL codec — the
    * vision-pipeline step after m6's decode: each PNG is decoded
    * (`ImageIO.read`), horizontally FLIPPED and center-CROPPED by a
    * 1-px border (both pure index transforms, no resampling — so the
    * result is exactly closed-form), then RE-ENCODED to PNG and
    * decoded AGAIN, and the reported channel sums come from that
    * second decode: the oracle match proves the augment output
    * survives a full encode→decode round trip losslessly, not just
    * that the in-memory array math is right. Per-partition codec
    * init, map-only over the binary column; the K-row per-source
    * aggregate is the only exchange — the m-family's 100 TB shape.
    */
  val m9ImageAugment: Q = (s, d) => {
    import s.implicits._
    val augmented = packedPngMembers(s, d)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          // flip horizontally, then crop the 1-px border:
          // aug(x, y) = orig(w-2-x, y+1), size (w-2) x (h-2)
          val aug = new java.awt.image.BufferedImage(
            w - 2, h - 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h - 2) {
            var x = 0
            while (x < w - 2) {
              aug.setRGB(x, y, img.getRGB(w - 2 - x, y + 1))
              x += 1
            }
            y += 1
          }
          // full PNG round trip of the AUGMENTED image
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(aug, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          var (sr, sg, sb) = (0L, 0L, 0L)
          var yy = 0
          while (yy < back.getHeight) {
            var xx = 0
            while (xx < back.getWidth) {
              val p = back.getRGB(xx, yy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              xx += 1
            }
            yy += 1
          }
          AugDecoded(id, back.getWidth, back.getHeight, sr, sg, sb)
        }
      }
    augmented
      .join(graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
           sum(col("width").cast("long")).as("sum_width"),
           sum(col("height").cast("long")).as("sum_height"),
           sum(col("sum_r")).as("sum_r"),
           sum(col("sum_g")).as("sum_g"),
           sum(col("sum_b")).as("sum_b"))
  }

  case class AudioDecoded(doc_id: Long, n_samples: Int,
                          sum_amp: Long, sum_abs: Long,
                          max_amp: Int, min_amp: Int)

  /** REAL audio decode — the audio twin of m6, driven by the JDK's
    * actual WAV codec (`javax.sound.sampled`, zero added deps):
    *
    *  ENCODE (executor-side, foreachPartition): each doc renders a real
    *  RIFF/WAVE file — 16-bit signed little-endian PCM, mono, 8 kHz —
    *  whose samples are a pure function of its doc_id:
    *  n = 64 + id%128 samples, sample(i) = (id*37 + i*17) mod 4096
    *  − 2048 — written with `AudioSystem.write(…, Type.WAVE, file)`.
    *
    *  DECODE (typed mapPartitions, per-partition codec init): the files
    *  re-ingest through the `binaryFile` source and each payload goes
    *  through `AudioSystem.getAudioInputStream` — a real RIFF header /
    *  fmt-chunk parse, NOT a replay of the generator formula — the
    *  format is asserted (rate/width/channels), the PCM frames are read
    *  back and per-clip amplitude stats extracted.
    *
    * PCM WAV is lossless, so the oracle recomputes the identical stats
    * closed-form from the documents table; any codec drift (sample
    * width, endianness, header misparse) breaks the hash compare.
    */
  /** Executor-side WAV render shared by m7/m10: one real RIFF/WAVE
    * PCM file per doc (16-bit LE mono 8 kHz; n = 64+id%128 samples,
    * sample(i) = (id·37 + i·17) mod 4096 − 2048) — the closed form
    * the oracles recompute.
    */
  private def renderWavs(s: SparkSession, d: String, out: String): Unit =
    renderedOnce(out, idFingerprint(s, d)) {
    spreadIds(s, d)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val id = r.getLong(0)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, f"$id%012d.wav"), wavBytes(id))
        }
      }
  }

  /** The encoded RIFF/WAVE bytes of one clip — the shared render body
    * behind both media layouts: renderWavs writes one LOOSE file per
    * asset (m7/m10's small-file baseline), m11 packs the same bytes
    * into per-partition container shards. One source of truth keeps
    * the two layouts bit-identical, so m11's oracle can be m7's.
    */
  private[operators] def wavBytes(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // 16-bit LE mono PCM
    val n = (64 + id % 128).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((id * 37 + i * 17) % 4096 - 2048).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    WavCodec.writeWave(ais, bos)
    bos.toByteArray
  }

  /** JVM-held WAVE codec providers, resolved once through the PUBLIC
    * `javax.sound.sampled.spi` SPI. `AudioSystem.getAudioInputStream`
    * / `AudioSystem.write` funnel EVERY call through a synchronized
    * static provider registry (`JDK13Services.getProviders`), which
    * makes concurrent decode scale NEGATIVELY: measured on this host,
    * 5000 clips decode in 0.17 s on one thread but 0.45 s on four
    * through AudioSystem, while the held provider does 0.023 s / 0.009
    * s — same codec classes (com.sun.media.sound.WaveFileReader et
    * al., reached via the public SPI), same parse, minus the global
    * lock. This is the codec-pool-per-executor shape a production
    * decoder needs anyway: at 100 TB the decode stage is the hot loop
    * on every core of every executor, and a per-call synchronized
    * lookup is a whole-cluster serialization point. The first reader
    * that accepts the payload is cached (volatile publish; provider
    * instances are stateless) so steady-state probing throws no
    * exceptions; AudioSystem remains the fallback for exotic payloads.
    */
  private[operators] object WavCodec {
    import javax.sound.sampled._
    import scala.jdk.CollectionConverters._
    private lazy val readers: List[spi.AudioFileReader] =
      java.util.ServiceLoader.load(classOf[spi.AudioFileReader])
        .asScala.toList
    private lazy val writers: List[spi.AudioFileWriter] =
      java.util.ServiceLoader.load(classOf[spi.AudioFileWriter])
        .asScala.toList
    @volatile private var cachedReader: spi.AudioFileReader = null
    def read(bytes: Array[Byte]): AudioInputStream = {
      val c = cachedReader
      if (c != null)
        try return c.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: UnsupportedAudioFileException => }
      readers.foreach { r =>
        if (r ne c)
          try {
            val a = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            cachedReader = r
            return a
          } catch { case _: UnsupportedAudioFileException => }
      }
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    }
    def writeWave(ais: AudioInputStream, out: java.io.OutputStream): Unit =
      writers.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais)) match {
        case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, out); ()
        case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out); ()
      }
  }

  /** Real-codec WAV decode + amplitude stats — shared by m7 (loose
    * files) and m11 (packed shards) so the two layouts cannot drift.
    */
  private[operators] def decodeWav(id: Long, bytes: Array[Byte]): AudioDecoded = {
    import javax.sound.sampled._
    val ais = WavCodec.read(bytes)
    val f = ais.getFormat
    require(f.getSampleRate == 8000f && f.getSampleSizeInBits == 16 &&
            f.getChannels == 1 && !f.isBigEndian,
      s"codec misparse for clip $id: $f")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    var (sum, sabs) = (0L, 0L)
    var (mx, mn) = (Int.MinValue, Int.MaxValue)
    var i = 0
    while (i < n) {
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      sum += v; sabs += math.abs(v)
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    AudioDecoded(id, n, sum, sabs, mx, mn)
  }

  val m7AudioDecode: Q = (s, d) => {
    import s.implicits._
    val out = Coverage.scratchDir("m7_wavs")
    renderWavs(s, d, out)
    val decoded = s.read.format("binaryFile").load(out)
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "^(\\d+)", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // iterator-in/iterator-out is the codec-pool init point; the
        // pool itself is WavCodec's JVM-held SPI providers (AudioSystem
        // per-call lookup measured NEGATIVE thread scaling — see
        // WavCodec's scaladoc), so decodeWav is lock-free per clip
        it.map { case (id, bytes) => decodeWav(id, bytes) }
      }
    val meta = graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
    decoded.join(meta, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_clips"),
           sum(col("n_samples").cast("long")).as("n_samples"),
           sum(col("sum_amp")).as("sum_amp"),
           sum(col("sum_abs")).as("sum_abs"),
           max(col("max_amp")).cast("long").as("max_amp"),
           min(col("min_amp")).cast("long").as("min_amp"))
  }

  /** PACKED-media layout twin of m7 — the 100 TB answer to the
    * m-family's one remaining anti-pattern (r9 verdict: media as
    * thousands of loose per-asset files measurably owned m10's
    * residual cost — the decode stage was >90% per-open I/O wait; at
    * cluster scale a loose layout is billions of object-store
    * requests). The SAME clips (wavBytes — bit-identical to m7's
    * loose files) pack into ONE container shard per executor
    * partition with a parquet offset index (sources.MediaShards:
    * WebDataset-tar / sequence-file discipline, and the media-bytes
    * analog of the reference's K1 row chunking,
    * kafka_topic_dumper/kafka_client.py:239-243). The read path is
    * one index shuffle (K-byte rows) + one open and one forward
    * sequential scan per shard, then the identical real-codec decode
    * (decodeWav) and per-source rollup — so the m7 vs m11 bench
    * delta isolates exactly the layout cost, and the oracle is
    * LITERALLY m7's closed-form SQL: a lossless pack must reproduce
    * the loose layout's stats hash-exactly.
    */
  /** The shared PACKED audio fixture (one pack per corpus, reused by
    * m10/m11/m12): the same wavBytes clips as m7's loose files, packed
    * into per-partition container shards with a parquet offset index.
    */
  private def packedWavMembers(s: SparkSession, d: String,
      where: Seq[org.apache.spark.sql.Column] = Nil)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val out = Coverage.scratchDir("m11_shards")
    renderedOnce(out, idFingerprint(s, d)) {
      graft.sources.MediaShards.pack(s, spreadIds(s, d), out)(wavBytes)
    }
    graft.sources.MediaShards.readMembers(s, out, where)
  }

  private def shardDecodeRollup(s: SparkSession, d: String,
      where: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import s.implicits._
    packedWavMembers(s, d, where)
      .mapPartitions { it =>
        // same batch shape as m7's decode (codec-pool init point)
        it.map { case (id, bytes) => decodeWav(id, bytes) }
      }
      .join(graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_clips"),
           sum(col("n_samples").cast("long")).as("n_samples"),
           sum(col("sum_amp")).as("sum_amp"),
           sum(col("sum_abs")).as("sum_abs"),
           max(col("max_amp")).cast("long").as("max_amp"),
           min(col("min_amp")).cast("long").as("min_amp"))
  }

  val m11MediaShards: Q = (s, d) => shardDecodeRollup(s, d, Nil)

  /** PRUNED read over the packed layout — the selection half of the
    * 100 TB story (m11 is the sequential-scan half): the doc_id
    * predicate applies to the parquet OFFSET INDEX (reaching its scan
    * as a pushed filter — MediaShardsSpec pins the plan), and the
    * member reader seeks only to selected offsets, so "decode 5% of
    * the corpus" touches ~5% of the shard bytes instead of opening
    * every asset (the loose layout's only pruning is filename
    * gymnastics AFTER listing all N files). Shares m11's fixture and
    * decode; the oracle is the same closed form under the same WHERE.
    */
  val m12ShardPruned: Q = (s, d) =>
    shardDecodeRollup(s, d, Seq(col("doc_id") < 250))

  case class PHashed(doc_id: Long, phash: Long)

  /** Perceptual-hash IMAGE DEDUP over real decoded PNGs — the visual
    * near-dup stage of a multimodal training pipeline (decode →
    * fingerprint → bucket-join clusters), end-to-end through the JDK's
    * actual codec. Each asset's image is a pure function of
    * `doc_id % 64` (same pixel formula as m6 keyed on that residue),
    * so the corpus deliberately contains ~31-member duplicate classes
    * for the detector to find; the encoder MEMOIZES renders per
    * partition (64 distinct images exist — the per-partition-init
    * pattern a real encoder pool would use). The fingerprint is a
    * dHash-style difference hash: adjacent-pixel gray comparisons over
    * the 8×8 top-left crop (every image is ≥8×8 by construction; a
    * production dHash average-pools to 9×8 first — the crop keeps the
    * oracle integer-exact without replaying pooling boundaries),
    * 7 bits × 8 rows = a 56-bit key.
    *
    * Scale shape: decode + hash are one map pass; the hash IS the
    * shuffle key (exact bucket join, d1's discipline — no pairwise
    * comparisons anywhere); the histogram is a K-row re-aggregate.
    * PNG is lossless so the oracle rebuilds every hash closed-form
    * from the 64 residue classes and replays the same two aggregates.
    */
  val m8PerceptualDedup: Q = (s, d) => {
    import s.implicits._
    // packed like m6/m9 (r11 — see packedPngMembers scaladoc), with
    // m8's own fixture: assets key on doc_id % 64 so planted duplicate
    // classes exist. The render memoizes the 64 distinct encodes PER
    // TASK (the closure deserializes per task, so `memo` is task-local
    // — the encoder-pool init pattern the loose writer used).
    val out = Coverage.scratchDir("m8_png_shards")
    renderedOnce(out, idFingerprint(s, d)) {
      val memo = scala.collection.mutable.Map.empty[Long, Array[Byte]]
      graft.sources.MediaShards.pack(s, spreadIds(s, d), out)(
        id => memo.getOrElseUpdate(id % 64, pngBytes(id % 64)))
    }
    val hashed = graft.sources.MediaShards.readMembers(s, out, Nil)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          def gray(px: Int, py: Int): Int = {
            val p = img.getRGB(px, py)
            (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          }
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 7) {
              if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 7 + x)
              x += 1
            }
            y += 1
          }
          PHashed(id, hash)
        }
      }
    hashed.groupBy(col("phash"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("cmin"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
           sum(col("cluster_size")).as("n_docs"),
           min(col("cmin")).as("min_doc"))
  }

  val queries: Map[String, Q] = Map(
    "m8_perceptual_dedup" -> m8PerceptualDedup,
    "m5_binary_ingest" -> m5BinaryIngest,
    "m6_image_decode" -> m6ImageDecode,
    "m9_image_augment" -> m9ImageAugment,
    "m10_audio_augment" -> m10AudioAugment,
    "m7_audio_decode" -> m7AudioDecode,
    "m11_media_shards" -> m11MediaShards,
    "m12_shard_pruned" -> m12ShardPruned,
    "m1_decode_meta" -> m1DecodeMeta,
    "m2_frame_sample" -> m2FrameSample,
    "m3_resize_plan" -> m3ResizePlan,
    "m4_feature_extract" -> m4FeatureExtract,
  )

  /** Closed-form replay of the WAV amplitude stats — shared by m7
    * (loose files), m11 (packed shards) and m12 (pruned shard read):
    * all three read bit-identical clips, so one closed form pins all,
    * parameterized only by the member predicate.
    */
  private def wavStatsOracle(whereClause: String = ""): String =
    s"""WITH clips AS (
      |  SELECT doc_id, source, 64 + doc_id % 128 AS n
      |  FROM documents$whereClause),
      |s AS (
      |  SELECT source, n,
      |    list_transform(range(0, n),
      |                   i -> (doc_id*37 + i*17) % 4096 - 2048) AS xs
      |  FROM clips)
      |SELECT source, count(1) AS n_clips,
      |  CAST(sum(n) AS BIGINT) AS n_samples,
      |  CAST(sum(list_sum(xs)) AS BIGINT) AS sum_amp,
      |  CAST(sum(list_sum(list_transform(xs, x -> abs(x)))) AS BIGINT) AS sum_abs,
      |  CAST(max(list_max(xs)) AS BIGINT) AS max_amp,
      |  CAST(min(list_min(xs)) AS BIGINT) AS min_amp
      |FROM s GROUP BY source""".stripMargin

  // The fake decode is pure byte arithmetic, so the oracle can replay
  // it in SQL: width = 16 + octet_len%64, height = 16 + first_byte%64.
  val oracles: Map[String, String] = Map(
    // every hash rebuilt closed-form from the 64 residue classes (the
    // PNG round-trip is lossless), then the same two aggregates
    "m8_perceptual_dedup" ->
      """WITH ks AS (SELECT DISTINCT doc_id % 64 AS k FROM documents),
        |px AS (SELECT k, x.i AS x, y.i AS y FROM ks
        |       CROSS JOIN (SELECT unnest(range(0, 8)) AS i) x
        |       CROSS JOIN (SELECT unnest(range(0, 8)) AS i) y),
        |g AS (SELECT k, x, y,
        |  ((31*k + 7*x + 13*y) % 256 + (31*k + 7*x + 13*y + 101) % 256
        |   + (31*k + 7*x + 13*y + 202) % 256) // 3 AS gray FROM px),
        |b AS (SELECT g0.k, g0.x, g0.y,
        |        CASE WHEN g1.gray > g0.gray THEN 1 ELSE 0 END AS bit
        |      FROM g g0 JOIN g g1
        |        ON g0.k = g1.k AND g1.x = g0.x + 1 AND g1.y = g0.y
        |      WHERE g0.x < 7),
        |h AS (SELECT k,
        |        CAST(sum(bit * (1::BIGINT << (y*7 + x))) AS BIGINT) AS phash
        |      FROM b GROUP BY k),
        |dc AS (SELECT doc_id % 64 AS k, doc_id FROM documents),
        |cl AS (SELECT phash, count(1) AS cluster_size, min(doc_id) AS cmin
        |       FROM dc JOIN h USING (k) GROUP BY phash)
        |SELECT cluster_size, count(1) AS n_clusters,
        |  CAST(sum(cluster_size) AS BIGINT) AS n_docs, min(cmin) AS min_doc
        |FROM cl GROUP BY cluster_size""".stripMargin,
    // the clip is a pure function of doc_id and PCM WAV is lossless,
    // so the oracle rebuilds every decoded amplitude stat closed-form
    "m7_audio_decode" -> wavStatsOracle(),
    // m11 reads the SAME clips from the packed-shard layout, so its
    // oracle is literally m7's: a lossless pack + index round trip
    // must reproduce the loose layout's stats hash-exactly
    "m11_media_shards" -> wavStatsOracle(),
    // m12 is the same closed form under the member predicate: an
    // index-pruned read must equal decoding the filtered subset
    "m12_shard_pruned" -> wavStatsOracle(" WHERE doc_id < 250"),
    // the image is a pure function of doc_id and PNG is lossless, so
    // the oracle rebuilds every decoded stat without touching a codec:
    // per-pixel channel values replayed via list_transform over w*h
    // trim+inversion-halving gain replayed closed-form; DuckDB's //
    // truncates toward zero like Java int division, so -(v // 2) is
    // bit-identical on negative samples
    "m10_audio_augment" ->
      """WITH clips AS (
        |  SELECT doc_id, source, 64 + doc_id % 128 AS n FROM documents),
        |sm AS (
        |  SELECT source, n - 16 AS n2,
        |    list_transform(range(16, n),
        |      i -> -((((doc_id*37 + i*17) % 4096) - 2048) // 2)) AS vs
        |  FROM clips)
        |SELECT source, count(1) AS n_clips,
        |  CAST(sum(n2) AS BIGINT) AS n_samples,
        |  CAST(sum(list_sum(vs)) AS BIGINT) AS sum_amp,
        |  CAST(sum(list_sum(list_transform(vs, v -> abs(v)))) AS BIGINT)
        |    AS sum_abs
        |FROM sm GROUP BY source""".stripMargin,
    // flip+crop replayed closed-form: aug(x,y) = orig(w-2-x, y+1)
    "m9_image_augment" ->
      """WITH imgs AS (
        |  SELECT doc_id, source,
        |         8 + doc_id % 25 AS w,
        |         8 + (doc_id // 7) % 25 AS h
        |  FROM documents),
        |px AS (
        |  SELECT source, w - 2 AS w2, h - 2 AS h2,
        |    list_sum(list_transform(range(0, (w-2)*(h-2)),
        |      i -> (doc_id*31 + 7*(w - 2 - (i % (w-2)))
        |            + 13*((i // (w-2)) + 1)) % 256)) AS s_r,
        |    list_sum(list_transform(range(0, (w-2)*(h-2)),
        |      i -> (doc_id*31 + 7*(w - 2 - (i % (w-2)))
        |            + 13*((i // (w-2)) + 1) + 101) % 256)) AS s_g,
        |    list_sum(list_transform(range(0, (w-2)*(h-2)),
        |      i -> (doc_id*31 + 7*(w - 2 - (i % (w-2)))
        |            + 13*((i // (w-2)) + 1) + 202) % 256)) AS s_b
        |  FROM imgs)
        |SELECT source, count(1) AS n_images,
        |  CAST(sum(w2) AS BIGINT) AS sum_width,
        |  CAST(sum(h2) AS BIGINT) AS sum_height,
        |  CAST(sum(s_r) AS BIGINT) AS sum_r,
        |  CAST(sum(s_g) AS BIGINT) AS sum_g,
        |  CAST(sum(s_b) AS BIGINT) AS sum_b
        |FROM px GROUP BY source""".stripMargin,
    "m6_image_decode" ->
      """WITH imgs AS (
        |  SELECT doc_id, source,
        |         8 + doc_id % 25 AS w,
        |         8 + (doc_id // 7) % 25 AS h
        |  FROM documents),
        |px AS (
        |  SELECT source, w, h,
        |    list_sum(list_transform(range(0, w*h),
        |      i -> (doc_id*31 + 7*(i % w) + 13*(i // w)) % 256)) AS s_r,
        |    list_sum(list_transform(range(0, w*h),
        |      i -> (doc_id*31 + 7*(i % w) + 13*(i // w) + 101) % 256)) AS s_g,
        |    list_sum(list_transform(range(0, w*h),
        |      i -> (doc_id*31 + 7*(i % w) + 13*(i // w) + 202) % 256)) AS s_b
        |  FROM imgs)
        |SELECT source, count(1) AS n_images,
        |  CAST(sum(w) AS BIGINT) AS sum_width,
        |  CAST(sum(h) AS BIGINT) AS sum_height,
        |  CAST(sum(s_r) AS BIGINT) AS sum_r,
        |  CAST(sum(s_g) AS BIGINT) AS sum_g,
        |  CAST(sum(s_b) AS BIGINT) AS sum_b
        |FROM px GROUP BY source""".stripMargin,
    "m5_binary_ingest" ->
      """SELECT source, count(1) AS n_files,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  min(md5(text)) AS min_md5
        |FROM documents GROUP BY source""".stripMargin,
    "m1_decode_meta" ->
      """SELECT source, count(1) AS n_blobs,
        | CAST(sum(16 + octet_length(CAST(text AS BLOB)) % 64) AS BIGINT) AS sum_width,
        | CAST(sum(16 + ascii(substring(text, 1, 1)) % 64) AS BIGINT) AS sum_height,
        | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "m2_frame_sample" ->
      """SELECT source, count(1) AS n_sampled_frames, max(frame_idx) AS max_frame_idx
        |FROM (SELECT source, unnest(range(0, 1 + n_chars % 8, 2)) AS frame_idx
        |      FROM documents)
        |GROUP BY source""".stripMargin,
    "m3_resize_plan" ->
      """SELECT greatest(16, (16 + octet_length(CAST(text AS BLOB)) % 64) // 2) AS target_w,
        |       greatest(16, (16 + ascii(substring(text, 1, 1)) % 64) // 2) AS target_h,
        |       count(1) AS n_blobs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // the fake feature extractor is pure codepoint arithmetic over the
    // first 64 chars (ASCII corpus), so the oracle replays it in SQL
    "m4_feature_extract" ->
      """WITH f AS (SELECT source,
        |  list_transform(range(1, least(length(text), 64) + 1),
        |                 i -> ascii(substring(text, i, 1))) AS cs
        |  FROM documents)
        |SELECT source, count(1) AS n_blobs,
        |  CAST(sum(length(list_filter(cs, c -> c % 4 = 0))) AS BIGINT) AS sum_h0,
        |  CAST(sum(length(list_filter(cs, c -> c % 4 = 1))) AS BIGINT) AS sum_h1,
        |  CAST(sum(length(list_filter(cs, c -> c % 4 = 2))) AS BIGINT) AS sum_h2,
        |  CAST(sum(length(list_filter(cs, c -> c % 4 = 3))) AS BIGINT) AS sum_h3,
        |  CAST(sum(list_sum(list_transform(cs, c -> c::BIGINT))) AS BIGINT) AS sum_chars
        |FROM f GROUP BY source""".stripMargin,
  )
}
