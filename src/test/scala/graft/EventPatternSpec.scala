package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** w11 event-pattern (CEP) invariants the oracle compare can't see:
  * the per-user symbol strings conserve the event count, the funnel
  * count is bounded by both its endpoints' symbol counts, and the
  * regex's non-overlap semantics match a direct state-machine replay.
  */
class EventPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    operators.Windows.queries("w11_event_pattern")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("sequences conserve the corpus event count") {
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum == total,
      "per-user sequence lengths must tile the events table")
  }

  test("funnel counts match a direct state-machine replay") {
    // replay s[^p]*p with an explicit two-state machine over the same
    // ordered per-user stream — independent of java.util.regex
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
              col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, g) =>
        val seq = g.sortBy(_._2).map(_._3)
        var inFunnel = false; var n = 0L
        seq.foreach {
          case "signup" => if (!inFunnel) inFunnel = true
          case "purchase" => if (inFunnel) { n += 1; inFunnel = false }
          case _ => ()
        }
        (u, n)
      }
    rows.foreach { case (u, _, funnels, purchases) =>
      assert(funnels == e(u), s"user $u: regex count $funnels != replay ${e(u)}")
      assert(funnels <= purchases,
        s"user $u: every funnel must end in one of the user's purchases")
    }
  }
}

/** t22 readability invariants: tiers partition the corpus, the
  * aggregate bounds are internally consistent, and the integer score
  * is monotone in the syllable load (the direction the formula says).
  */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("tiers partition the corpus and bounds are consistent") {
    val rows = operators.TextAnalysis.queries("t22_readability")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == nDocs, "tier doc counts must tile the corpus")
    rows.foreach { case (lang, tier, n, avg, lo, hi) =>
      assert(n > 0 && lo <= avg && avg <= hi,
        s"($lang,$tier) bounds inconsistent: n=$n lo=$lo avg=$avg hi=$hi")
      tier match {
        case "easy"   => assert(lo >= 90000)
        case "medium" => assert(lo >= 60000 && hi < 90000)
        case "hard"   => assert(hi < 60000)
      }
    }
  }

  test("the score falls as syllables-per-word rises (fixed words/sent)") {
    // direct integer replay of the formula at fixed n_sent=2, n_words=40
    def score(nSyll: Long) = 206835L - (1015L * 40) / 2 - (84600L * nSyll) / 40
    assert(score(40) > score(60) && score(60) > (score(80)),
      "readability must be antitone in syllable density")
  }
}
