package graft

import graft.pipeline.OffsetPlanner
import org.scalatest.funsuite.AnyFunSuite

/** Tail-N planning vs the reference formula (kafka_client.py:144-156),
  * including the FIXTURES.md A4 edge cases. Property cases are
  * generated with a fixed seed (no scalatest-scalacheck bridge in the
  * offline cache).
  */
class OffsetPlannerSpec extends AnyFunSuite {

  test("single partition takes the last n") {
    val (t, avail) = OffsetPlanner.tailN(Map(0 -> 0L), Map(0 -> 1000L), 300)
    assert(t == Map(0 -> 700L) && avail == 300)
  }

  test("even spread across partitions with ceil") {
    // n=10 over 3 partitions → ceil(10/3)=4 per partition
    val begin = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
    val end = Map(0 -> 100L, 1 -> 100L, 2 -> 100L)
    val (t, avail) = OffsetPlanner.tailN(begin, end, 10)
    assert(t == Map(0 -> 96L, 1 -> 96L, 2 -> 96L) && avail == 12)
  }

  test("short partition yields fewer (no global rebalance — parity)") {
    val begin = Map(0 -> 0L, 1 -> 0L)
    val end = Map(0 -> 100L, 1 -> 2L)
    val (t, avail) = OffsetPlanner.tailN(begin, end, 100)
    assert(t(0) == 50L && t(1) == 0L && avail == 52)
  }

  test("empty topic: begin == end") {
    val (t, avail) = OffsetPlanner.tailN(Map(0 -> 5L), Map(0 -> 5L), 10)
    assert(t == Map(0 -> 5L) && avail == 0)
  }

  test("n greater than available caps at begin") {
    val (t, avail) = OffsetPlanner.tailN(Map(0 -> 10L), Map(0 -> 20L), 1000)
    assert(t == Map(0 -> 10L) && avail == 10)
  }

  test("no partitions") {
    assert(OffsetPlanner.tailN(Map.empty, Map.empty, 10) == (Map.empty, 0L))
  }

  test("invariants over 500 random topics: begin <= target <= end; available bounded") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val nParts = 1 + rnd.nextInt(16)
      val parts = (0 until nParts).map { p =>
        val b = rnd.nextLong(10000)
        p -> (b, b + rnd.nextLong(10000))
      }.toMap
      val n = rnd.nextLong(100000)
      val begin = parts.map { case (p, (b, _)) => p -> b }
      val end = parts.map { case (p, (_, e)) => p -> e }
      val (targets, avail) = OffsetPlanner.tailN(begin, end, n)
      targets.foreach { case (p, t) =>
        assert(t >= begin(p) && t <= end(p), s"target out of range: p=$p")
      }
      assert(avail >= 0)
      // never exceeds requested + one ceil-rounding per partition
      assert(avail <= n + nParts)
      // and never exceeds what exists
      assert(avail <= parts.map { case (_, (b, e)) => e - b }.sum)
    }
  }

  test("offsets JSON shape matches the Kafka source contract") {
    val json = OffsetPlanner.offsetsJson("t1", Map(1 -> 5L, 0 -> 3L))
    assert(json == """{"t1":{"0":3,"1":5}}""")
  }
}
