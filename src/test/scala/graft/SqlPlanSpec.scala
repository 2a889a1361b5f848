package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-4 continuation queries: the
  * SCALE-relevant plan properties the oracle compare can't see. These
  * assert on executedPlan strings at sf0.001 — plan SHAPE is
  * data-size-independent for these queries (join strategies may flip
  * broadcast↔SMJ with size, so assertions avoid naming them where the
  * property under test is keyed-vs-nested, not the algorithm).
  */
class SqlPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("x22's EXISTS + NOT EXISTS decorrelate to keyed semi/anti joins") {
    val p = plan("x22_tpch_q21")
    assert(p.contains("LeftSemi"), "EXISTS should become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS should become an anti join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "correlated pair must stay keyed — a nested loop detonates at scale")
  }

  test("x24's lateral ORDER BY+LIMIT plans a rank-limit pushdown, not a per-row subplan") {
    val p = plan("x24_lateral_topk")
    // WindowGroupLimit(Partial) prunes to top-k per partition BEFORE the
    // exchange — the decorrelated lateral's scale-correct form
    assert(p.contains("WindowGroupLimit"),
      "lateral top-k should decorrelate to a window with group-limit pushdown")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("t13 plans TakeOrderedAndProject — per-partition top-K, no global sort") {
    val p = plan("t13_uniform_sample")
    assert(p.contains("TakeOrderedAndProject(limit=100"))
  }

  test("t14's exchanges carry slim rows — the corpus text never shuffles") {
    val p = plan("t14_corpus_pipeline")
    // dedup gets the map-side WindowGroupLimit pre-prune too
    assert(p.contains("WindowGroupLimit"))
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      "text column must be projected away before any exchange")
  }
}
