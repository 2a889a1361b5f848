package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the host-shift-aware bench regression watch (Bench.regressionWatch).
  *
  * The r9 failure mode this exists to prevent: the driver's bench pass ran
  * on a uniformly ~12%-slower host and the raw >20% rule flagged 31
  * queries, none a real regression — a watch that cries wolf 31 times on a
  * host mode will be ignored the one time a single query actually regresses
  * (BASELINE.md's silent-drift scenario). The fix normalizes each query's
  * round-over-round ratio by the run-median ratio before the 20% rule.
  */
class BenchWatchSpec extends AnyFunSuite {

  private val prev: Map[String, Double] =
    (1 to 40).map(i => s"q$i" -> (0.2 + i * 0.05)).toMap

  test("a uniform host shift flags nothing and is reported as host_shift") {
    // every query 25% slower — the old raw rule would flag all 40
    val now = prev.map { case (k, v) => k -> v * 1.25 }
    val (shift, flagged) = Bench.regressionWatch(prev, now)
    assert(math.abs(shift - 1.25) < 1e-9)
    assert(flagged.isEmpty,
      s"uniform 25% host shift must not flag queries, got $flagged")
  }

  test("a planted single-query 2x slowdown fires through a host shift") {
    val now = prev.map { case (k, v) =>
      k -> (if (k == "q7") v * 2.0 * 1.12 else v * 1.12)
    }
    val (shift, flagged) = Bench.regressionWatch(prev, now)
    assert(math.abs(shift - 1.12) < 1e-6)
    assert(flagged.map(_._1) == Seq("q7"))
    val norm = flagged.head._4
    assert(math.abs(norm - 2.0) < 1e-6,
      s"normalized ratio should be the 2x net of host shift, got $norm")
  }

  test("sub-second jitter above 20% but below the 0.3s net delta is silent") {
    // the r10 observation: two clean back-to-back passes flagged 13
    // and 10 DISJOINT queries, every one a sub-second min moving
    // <= 0.24 s — per-query jitter, not code. The absolute-delta term
    // silences exactly this class.
    val now = prev.map { case (k, v) =>
      k -> (if (k == "q2") v * 1.35 else v) // q2: 0.30 -> 0.405, +0.105
    }
    val (_, flagged) = Bench.regressionWatch(prev, now)
    assert(flagged.isEmpty, s"jitter-sized move flagged: $flagged")
  }

  test("the r9 m10 drift (3.05 -> 4.0 s) fires both terms") {
    val p = prev + ("m10" -> 3.05)
    val now = p.map { case (k, v) => k -> (if (k == "m10") 4.0 else v) }
    val (_, flagged) = Bench.regressionWatch(p, now)
    assert(flagged.map(_._1) == Seq("m10"))
  }

  test("a sub-floor query that blows up is still flagged (floor on max)") {
    // prev 0.10 s is below the 0.15 s jitter floor; the old rule
    // (floor applied to prev only) never flagged it at ANY size of jump
    val p = prev + ("tiny" -> 0.10)
    val now = p.map { case (k, v) => k -> (if (k == "tiny") 5.0 else v) }
    val (_, flagged) = Bench.regressionWatch(p, now)
    assert(flagged.map(_._1) == Seq("tiny"))
  }

  test("jitter below the floor stays silent") {
    val p = Map("a" -> 0.05, "b" -> 0.08)
    val now = Map("a" -> 0.09, "b" -> 0.04) // 80% moves, all sub-floor
    val (shift, flagged) = Bench.regressionWatch(p, now)
    assert(shift == 1.0 && flagged.isEmpty)
  }

  test("missing history or disjoint query sets degrade to silence") {
    val (shift, flagged) = Bench.regressionWatch(Map.empty, prev)
    assert(shift == 1.0 && flagged.isEmpty)
  }

  test("a three-round 14% staircase is invisible round-over-round " +
       "but fires against the best-ever anchor") {
    // the r10 finding: m10 stepped 3.10 -> 3.59 (norm 1.14, under the
    // 1.2 flag), BECAME the new prev, and the committed pass then read
    // regressions: [] while sitting 16% over its r9 level. Three such
    // steps compound to 1.48x with every individual step silent; the
    // anchor (baseline = best-ever min, i.e. the round-0 value) is
    // what catches it.
    val base = prev + ("m" -> 3.0)
    val steps = (1 to 3).map { k =>
      base.map { case (q, v) =>
        q -> (if (q == "m") v * math.pow(1.14, k) else v)
      }
    }
    // prev-only watch: every consecutive pair is silent
    (base +: steps).sliding(2).foreach { case Seq(a, b) =>
      val (_, flagged) = Bench.regressionWatch(a, b)
      assert(flagged.isEmpty, s"a single 14% step must not flag: $flagged")
    }
    // anchor watch: best = round-0 committed mins; fires by step 2
    val (_, silent)  = Bench.regressionWatch(base, steps(0))
    val (_, caught2) = Bench.regressionWatch(base, steps(1))
    val (_, caught3) = Bench.regressionWatch(base, steps(2))
    assert(silent.isEmpty)
    assert(caught2.map(_._1) == Seq("m"),
      s"cumulative 1.30x with +0.9 s must fire the anchor, got $caught2")
    assert(caught3.map(_._1) == Seq("m"))
  }

  test("below 5 overlapping queries the host-shift estimate falls back " +
       "to 1.0 (no laundering a 2x slowdown through a tiny median)") {
    // one shared query, twice as slow: the old median would read
    // hostShift = 2.0, norm = 1.0, silence
    val p = Map("only" -> 1.0)
    val now = Map("only" -> 2.0)
    val (shift, flagged) = Bench.regressionWatch(p, now)
    assert(shift == 1.0)
    assert(flagged.map(_._1) == Seq("only"))
  }

  test("a surface-wide move beyond ±50% is marked suspect") {
    assert(Bench.shiftSuspect(1.6))
    assert(Bench.shiftSuspect(0.6))
    assert(!Bench.shiftSuspect(1.16)) // the r10 judge-pass host mode
    assert(!Bench.shiftSuspect(0.91)) // the r10 builder-pass host mode
  }

  test("the final stdout line stays parseable inside a 2000-char tail " +
       "capture even on a flagged-heavy pass (the r14 empty-PERF bug)") {
    // worst realistic case: several failures AND a large flag count —
    // the r14 pass carried 28 regressions inline and the metric line
    // overflowed the driver's 2000-char capture; the compact line
    // reduces flags to counts so its length is bounded
    val line = Bench.compactLine(
      total = 1234.567890123, nQueries = 237, runs = 3,
      spreadPct = 14.812, failedRunSec = 120.34,
      failed = Seq("d8_prefix_join", "t20_bpe_pairs", "x23_tpch_q2"),
      hostShift = 2.034, suspect = true, nRegressions = 28,
      nRatchets = 53, perQueryFile = "BENCH_PER_QUERY.json",
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 600, s"compact line too long (${line.length})")
    assert(!line.contains("\n"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(math.abs(node.get("value").asDouble - 1234.567890123) < 1e-9)
    assert(node.get("n_queries").asInt == 237)
    assert(node.get("runs").asInt == 3)
    assert(node.get("failed").size == 3)
    assert(node.get("host_shift_suspect").asBoolean)
    assert(node.get("n_regressions").asInt == 28)
    assert(node.get("per_query_file").asText == "BENCH_PER_QUERY.json")
    assert(node.get("sf").asText.endsWith("sf0.1"))
  }
}
