package graft

/** 1-vs-N-thread PNG decode A/B through the exact m6/m9 entry point
  * (`ImageIO.read(InputStream)`) — the image-side symmetry check for
  * the r12 WAV finding (AudioSystem's synchronized static provider
  * registry measured NEGATIVE thread scaling: 5000 decodes 0.17 s on
  * 1 thread, 0.45 s on 4, fixed by JVM-held SPI providers in
  * Multimodal.WavCodec). `ImageIO.read` consults the IIORegistry per
  * call too; this main measures whether that lookup serializes
  * concurrent decode the same way. No Spark — pure JVM, same codec
  * classes the mapPartitions body uses.
  *
  * Output: one JSON line {"decodes":…,"t1_s":…,"tN_s":…,
  * "threads":N,"speedup":…} — speedup < 1 is the registry-lock
  * signature (scaling is measured on the SAME total decode count, so
  * perfect scaling reads ~N, contention reads < 1).
  */
object PngThreadAb {
  private def png(key: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = (8 + key % 25).toInt
    val h = (8 + (key / 7) % 25).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int =
          ((key * 31 + 7L * x + 13L * y + 101L * c) % 256).toInt
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // the m6 decode body, minus the pixel rollup (decode-only: the
  // registry lookup + header/IDAT/zlib inflate is what could contend)
  private def decode(bytes: Array[Byte]): Int = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    img.getWidth * img.getHeight
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val threads = if (args.length > 1) args(1).toInt else 4
    val fixtures = (0L until 64L).map(png).toArray
    // warmup: JIT + classloading + registry population
    (0 until 2000).foreach(i => decode(fixtures(i % 64)))
    def run(parallelism: Int): Double = {
      val per = n / parallelism
      val t0 = System.nanoTime()
      val ts = (0 until parallelism).map { t =>
        val th = new Thread(() => {
          var i = 0
          var acc = 0
          while (i < per) { acc += decode(fixtures((t * per + i) % 64)); i += 1 }
          if (acc == Int.MinValue) println("") // keep acc live
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // interleave reps, keep mins (host-burst discipline)
    var (t1, tN) = (Double.MaxValue, Double.MaxValue)
    (0 until 3).foreach { _ =>
      t1 = math.min(t1, run(1))
      tN = math.min(tN, run(threads))
    }
    println(f"""{"decodes":$n,"t1_s":$t1%.3f,"tN_s":$tN%.3f,"threads":$threads,"speedup":${t1 / tN}%.2f}""")
  }
}
