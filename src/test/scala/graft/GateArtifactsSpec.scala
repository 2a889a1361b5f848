package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 committed evidence artifacts so they cannot
  * silently rot or lose members (the Sf10GateSpec discipline applied
  * to the ~sf1 gate and the packed-media layout A/B).
  */
class GateArtifactsSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("CORRECTNESS_SF1.json: the full surface is gated exact at ~sf1") {
    val doc = read("CORRECTNESS_SF1.json")
    val passes = """"pass": ?(true|false)""".r
      .findAllMatchIn(doc).map(_.group(1)).toSeq
    assert(passes.size >= 236, s"only ${passes.size} sf1 gate rows recorded")
    assert(passes.forall(_ == "true"),
      "an sf1 gate row is non-pass — re-run Verify+check at " +
        "target/scalecurve/sf1 and fix before re-committing")
    // rows-only would mean an oracle quietly vanished
    assert(doc.contains("\"n_rows_only\": 0"),
      "sf1 gate has rows-only entries — every query must be oracled")
  }

  test("MEDIA_SHARDS.json: the packed layout beats loose at both scales") {
    val doc = read("MEDIA_SHARDS.json")
    def num(key: String): Double = {
      val m = ("\"" + key + "\": ?([0-9.]+)").r.findFirstMatchIn(doc)
      assert(m.isDefined, s"$key missing from MEDIA_SHARDS.json")
      m.get.group(1).toDouble
    }
    // the artifact's claim is ORDERING (packed < loose, gap widening
    // with asset count), not exact timings — hosts drift, ratios hold
    val sf01 = num("layout_speedup")
    assert(sf01 > 1.5, s"sf0.1 layout speedup regressed to $sf01")
    val loose1 = num("loose_m7_audio_decode_s")
    val packed1 = num("packed_m11_media_shards_s")
    assert(packed1 < loose1,
      s"packed ($packed1) no longer beats loose ($loose1)")
  }
}
