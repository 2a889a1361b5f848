package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join: semantics (backward match, ties, no-match,
  * null time), the filter-pushdown rule, and the physical plan shape
  * (AsOfJoinExec with co-partitioned children, brute-force oracle
  * equivalence on random data).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quotes = Seq(
    // (q_id, sym, q_ts)
    (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 20L), (4L, "A", 30L),
    (5L, "B", 15L),
    (6L, "C", 99L)
  ).toDF("q_id", "sym", "q_ts")

  private def trades = Seq(
    // (t_id, t_sym, t_ts)
    (100L, "A", 5L),   // before any A quote → dropped
    (101L, "A", 10L),  // matches q1 (equal ts)
    (102L, "A", 25L),  // matches max of the ts=20 tie → q3
    (103L, "A", 99L),  // matches q4
    (104L, "B", 15L),  // equal-ts match q5
    (105L, "D", 50L)   // key with no quotes → dropped
  ).toDF("t_id", "t_sym", "t_ts")

  test("backward as-of semantics: latest at-or-before, ties by tiebreak") {
    val out = AsOf.join(trades, quotes,
        leftOn = Seq("t_sym"), rightOn = Seq("sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts",
        rightTieBreakCols = Seq("q_id"))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((101L, 1L), (102L, 3L), (103L, 4L), (104L, 5L)))
  }

  test("null right time never matches; null keys drop") {
    val q = Seq((1L, Option("A"), Option(10L)), (2L, Option("A"), None),
                (3L, None, Option(5L)))
      .toDF("q_id", "sym", "q_ts")
    val t = Seq((100L, Option("A"), Option(50L)), (101L, None, Option(50L)))
      .toDF("t_id", "t_sym", "t_ts")
    val out = AsOf.join(t, q, Seq("t_sym"), Seq("sym"), "t_ts", "q_ts", Seq("q_id"))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((100L, 1L))) // null-ts quote 2 skipped, null-key rows gone
  }

  test("matches brute-force oracle on random data") {
    val rng = new scala.util.Random(42)
    val left = (0 until 2000).map(i =>
      (i.toLong, s"k${rng.nextInt(20)}", rng.nextInt(1000).toLong))
      .toDF("l_id", "l_k", "l_t")
    val right = (0 until 1000).map(i =>
      (i.toLong, s"k${rng.nextInt(25)}", rng.nextInt(1000).toLong))
      .toDF("r_id", "r_k", "r_t")
    val native = AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
        rightTieBreakCols = Seq("r_id"))
      .select($"l_id", $"r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // oracle: plain join + argmax by (r_t, r_id)
    val oracle = left.join(right, $"l_k" === $"r_k" && $"r_t" <= $"l_t")
      .groupBy($"l_id")
      .agg(max_by($"r_id", struct($"r_t", $"r_id")).as("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(native == oracle)
  }

  test("plan shape: AsOfJoinExec present, filter pushed below the join") {
    val joined = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
      "t_ts", "q_ts", Seq("q_id"))
    val filtered = joined.filter($"t_id" > 101L)
    val optimized = filtered.queryExecution.optimizedPlan
    // the left-only predicate must sit BELOW AsOfJoinPlan after the rule
    import org.apache.spark.sql.graftnative.AsOfJoinPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val joinNode = optimized.collectFirst { case a: AsOfJoinPlan => a }
    assert(joinNode.isDefined, s"no AsOfJoinPlan in:\n$optimized")
    assert(optimized.collectFirst { case f: LFilter
             if f.condition.references.map(_.name).toSet == Set("t_id") &&
                joinNode.get.left.exists(_ eq f) => f }.isDefined ||
           joinNode.get.left.collectFirst { case f: LFilter => f }.isDefined,
           s"left filter not pushed below as-of join:\n$optimized")
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$phys")
    // result still correct after pushdown
    val out = filtered.select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((102L, 3L), (103L, 4L), (104L, 5L)))
  }

  test("left-outer variant keeps unmatched left rows null-padded") {
    val out = AsOf.join(trades, quotes,
        leftOn = Seq("t_sym"), rightOn = Seq("sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts",
        rightTieBreakCols = Seq("q_id"), joinType = "left_outer")
      .select($"t_id", $"q_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted
    // 100 (before any A quote) and 105 (no D quotes) survive with null
    assert(out.toSeq == Seq((100L, -1L), (101L, 1L), (102L, 3L),
                            (103L, 4L), (104L, 5L), (105L, -1L)))
  }

  test("outer matches brute-force left-join oracle on random data") {
    val rng = new scala.util.Random(7)
    val left = (0 until 1500).map(i =>
      (i.toLong, s"k${rng.nextInt(30)}", rng.nextInt(500).toLong))
      .toDF("l_id", "l_k", "l_t")
    val right = (0 until 700).map(i =>
      (i.toLong, s"k${rng.nextInt(40)}", rng.nextInt(500).toLong))
      .toDF("r_id", "r_k", "r_t")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    val native = AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
        rightTieBreakCols = Seq("r_id"), joinType = "left_outer")
      .select($"l_id", $"r_id")
      .collect().map(norm).sorted.toSeq
    val oracle = left.join(right, $"l_k" === $"r_k" && $"r_t" <= $"l_t", "left_outer")
      .groupBy($"l_id")
      .agg(max_by($"r_id", struct($"r_t", $"r_id")).as("r_id"))
      .collect().map(norm).sorted.toSeq
    assert(native == oracle)
  }

  test("forward direction matches earliest at-or-after; ties to min tiebreak") {
    val out = AsOf.join(trades, quotes,
        leftOn = Seq("t_sym"), rightOn = Seq("sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts",
        rightTieBreakCols = Seq("q_id"), direction = "forward")
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // 100(A,5)→q1(10); 101(A,10)→q1 equal-ts; 102(A,25)→q4(30);
    // 103(A,99) nothing later → dropped; 104(B,15)→q5; 105(D) dropped
    assert(out.toSeq == Seq((100L, 1L), (101L, 1L), (102L, 4L), (104L, 5L)))
  }

  test("forward matches brute-force min_by oracle on random data") {
    val rng = new scala.util.Random(99)
    val left = (0 until 1500).map(i =>
      (i.toLong, s"k${rng.nextInt(25)}", rng.nextInt(500).toLong))
      .toDF("l_id", "l_k", "l_t")
    val right = (0 until 800).map(i =>
      (i.toLong, s"k${rng.nextInt(30)}", rng.nextInt(500).toLong))
      .toDF("r_id", "r_k", "r_t")
    val native = AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
        rightTieBreakCols = Seq("r_id"), direction = "forward")
      .select($"l_id", $"r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oracle = left.join(right, $"l_k" === $"r_k" && $"r_t" >= $"l_t")
      .groupBy($"l_id")
      .agg(min_by($"r_id", struct($"r_t", $"r_id")).as("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(native == oracle)
  }

  test("tolerance bounds the match gap in both directions") {
    // backward, tol=10: trade 102(A,25) would match q3(A,20) — gap 5 ok;
    // trade 103(A,99) matches q4(A,30) — gap 69 > 10 → dropped
    val back = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
        "t_ts", "q_ts", Seq("q_id"), toleranceMicros = 10L)
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(back == Seq((101L, 1L), (102L, 3L), (104L, 5L)))
    // forward, tol=10: 100(A,5)→q1(10) gap 5 ok; 102(A,25)→q4(30) gap 5 ok;
    // but with tol=3 both drop
    val fwd = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
        "t_ts", "q_ts", Seq("q_id"), direction = "forward",
        toleranceMicros = 3L)
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fwd == Seq((101L, 1L), (104L, 5L))) // only the equal-ts matches
    // tolerance + outer: dropped matches become null-padded rows
    val outer = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
        "t_ts", "q_ts", Seq("q_id"), joinType = "left_outer",
        toleranceMicros = 10L)
      .select($"t_id", $"q_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    assert(outer == Seq((100L, -1L), (101L, 1L), (102L, 3L),
                        (103L, -1L), (104L, 5L), (105L, -1L)))
  }

  test("combinatorial sweep vs brute force: direction x joinType x tolerance") {
    val rng = new scala.util.Random(1234)
    val left = (0 until 600).map(i =>
      (i.toLong, s"k${rng.nextInt(12)}", rng.nextInt(200).toLong))
      .toDF("l_id", "l_k", "l_t")
    val right = (0 until 400).map(i =>
      (i.toLong, s"k${rng.nextInt(15)}", rng.nextInt(200).toLong))
      .toDF("r_id", "r_k", "r_t")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    for (dir <- Seq("backward", "forward");
         jt <- Seq("inner", "left_outer");
         tol <- Seq(-1L, 0L, 7L, 1000L)) {
      val native = AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
          rightTieBreakCols = Seq("r_id"), joinType = jt, direction = dir,
          toleranceMicros = tol)
        .select($"l_id", $"r_id")
        .collect().map(norm).sorted.toSeq
      val timeCond =
        if (dir == "backward") {
          if (tol < 0) $"r_t" <= $"l_t"
          else $"r_t" <= $"l_t" && $"l_t" - $"r_t" <= tol
        } else {
          if (tol < 0) $"r_t" >= $"l_t"
          else $"r_t" >= $"l_t" && $"r_t" - $"l_t" <= tol
        }
      val pick = if (dir == "backward")
        max_by($"r_id", struct($"r_t", $"r_id"))
      else min_by($"r_id", struct($"r_t", $"r_id"))
      val oracle = left.join(right, $"l_k" === $"r_k" && timeCond, jt)
        .groupBy($"l_id").agg(pick.as("r_id"))
        .collect().map(norm).sorted.toSeq
      assert(native == oracle,
        s"mismatch for direction=$dir joinType=$jt tolerance=$tol")
    }
  }

  test("nearest direction vs plain-Scala brute force, with tolerance") {
    val rng = new scala.util.Random(555)
    val lRows = (0 until 600).map(i =>
      (i.toLong, s"k${rng.nextInt(12)}", rng.nextInt(200).toLong))
    val rRows = (0 until 400).map(i =>
      (i.toLong, s"k${rng.nextInt(15)}", rng.nextInt(200).toLong))
    val left = lRows.toDF("l_id", "l_k", "l_t")
    val right = rRows.toDF("r_id", "r_k", "r_t")
    val byKey = rRows.groupBy(_._2)
    for (tol <- Seq(-1L, 0L, 5L, 50L); jt <- Seq("inner", "left_outer")) {
      val native = AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
          rightTieBreakCols = Seq("r_id"), direction = "nearest",
          joinType = jt, toleranceMicros = tol)
        .select($"l_id", $"r_id")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
      val expect = lRows.flatMap { case (lid, lk, lt) =>
        val cands = byKey.getOrElse(lk, Nil)
        val back = cands.filter(c => c._3 <= lt && (tol < 0 || lt - c._3 <= tol))
          .sortBy(c => (c._3, c._1)).lastOption           // max (t, id)
        val fwd = cands.filter(c => c._3 >= lt && (tol < 0 || c._3 - lt <= tol))
          .sortBy(c => (c._3, c._1)).headOption           // min (t, id)
        (back, fwd) match {
          case (Some(b), Some(f)) =>
            Some(lid -> (if (lt - b._3 <= f._3 - lt) b._1 else f._1))
          case (Some(b), None) => Some(lid -> b._1)
          case (None, Some(f)) => Some(lid -> f._1)
          case _ => if (jt == "left_outer") Some(lid -> -1L) else None
        }
      }.sorted.toSeq
      assert(native == expect, s"nearest mismatch at tolerance=$tol joinType=$jt")
    }
  }

  test("bucketed sides join with zero exchanges") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-asof-wh")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      trades.write.mode("overwrite").bucketBy(4, "t_sym").sortBy("t_sym", "t_ts")
        .option("path", s"$warehouse/trades_b").saveAsTable("graft_trades_b")
      quotes.write.mode("overwrite").bucketBy(4, "sym").sortBy("sym", "q_ts")
        .option("path", s"$warehouse/quotes_b").saveAsTable("graft_quotes_b")
      val joined = AsOf.join(
        spark.table("graft_trades_b"), spark.table("graft_quotes_b"),
        Seq("t_sym"), Seq("sym"), "t_ts", "q_ts", Seq("q_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed as-of must not shuffle; plan:\n$plan")
      assert(plan.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$plan")
      // same result as the unbucketed path
      val out = joined.select($"t_id", $"q_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(out == Seq((101L, 1L), (102L, 3L), (103L, 4L), (104L, 5L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_trades_b")
      spark.sql("DROP TABLE IF EXISTS graft_quotes_b")
    }
  }

  test("self-join on the same source gets distinct expr ids") {
    val e = Seq((1L, "u1", 10L, "signup"), (2L, "u1", 20L, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts")
    val sgn = e.filter($"event_type" === "signup")
      .select($"event_id".as("s_id"), $"user_id".as("s_user"), $"ts".as("s_ts"))
    val out = AsOf.join(p, sgn, Seq("user_id"), Seq("s_user"), "ts", "s_ts",
        Seq("s_id"))
      .select($"p_id", $"s_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 1L)))
  }

  test("merge loop is whole-stage-generated and compiles (no silent fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // fallback=false: a Janino compile failure now THROWS instead of
      // silently running the interpreted doExecute — so a green collect
      // plus the source assertion proves the generated path executed.
      // AQE off so codegenString can traverse the plain physical plan
      // (AdaptiveSparkPlanExec hides its final plan from the walker).
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
        "t_ts", "q_ts", Seq("q_id"))
      val out = joined.select($"t_id", $"q_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(out == Seq((101L, 1L), (102L, 3L), (103L, 4L), (104L, 5L)))
      val code = org.apache.spark.sql.execution.debug.codegenString(
        joined.queryExecution.executedPlan)
      assert(code.contains("asofAdvance"),
        s"as-of merge loop not in generated code:\n${code.take(2000)}")
      // ... and for every generated variant (outer/forward/nearest/tol)
      for ((jt, dir, tol) <- Seq(("left_outer", "backward", -1L),
                                 ("inner", "forward", 5L),
                                 ("inner", "nearest", -1L))) {
        val df = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
          "t_ts", "q_ts", Seq("q_id"), joinType = jt, direction = dir,
          toleranceMicros = tol)
        df.collect() // throws on codegen failure with fallback off
        assert(org.apache.spark.sql.execution.debug.codegenString(
          df.queryExecution.executedPlan).contains("asofAdvance"),
          s"no generated merge loop for joinType=$jt direction=$dir")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("generated and interpreted paths agree across the sweep") {
    val rng = new scala.util.Random(4242)
    val left = (0 until 600).map(i =>
      (i.toLong, s"k${rng.nextInt(12)}", rng.nextInt(200).toLong))
      .toDF("l_id", "l_k", "l_t")
    val right = (0 until 400).map(i =>
      (i.toLong, s"k${rng.nextInt(15)}", rng.nextInt(200).toLong))
      .toDF("r_id", "r_k", "r_t")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    def run(): Seq[Seq[(Long, Long)]] =
      for (dir <- Seq("backward", "forward", "nearest");
           jt <- Seq("inner", "left_outer");
           tol <- Seq(-1L, 7L)) yield
        AsOf.join(left, right, Seq("l_k"), Seq("r_k"), "l_t", "r_t",
            rightTieBreakCols = Seq("r_id"), joinType = jt, direction = dir,
            toleranceMicros = tol)
          .select($"l_id", $"r_id").collect().map(norm).sorted.toSeq
    val gen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val interp = try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      run()
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(gen == interp)
  }

  test("composite (string, long) join keys match brute force in all directions") {
    // exercises the generated multi-key compare chain (cmpChain /
    // heldKeyCmp / multi-parameter advance) that single-key tests miss
    val rng = new scala.util.Random(2026)
    val left = (0 until 800).map(i =>
      (i.toLong, s"k${rng.nextInt(6)}", rng.nextInt(4).toLong,
       rng.nextInt(200).toLong))
      .toDF("l_id", "l_k", "l_v", "l_t")
    val right = (0 until 500).map(i =>
      (i.toLong, s"k${rng.nextInt(7)}", rng.nextInt(5).toLong,
       rng.nextInt(200).toLong))
      .toDF("r_id", "r_k", "r_v", "r_t")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    for (dir <- Seq("backward", "forward"); jt <- Seq("inner", "left_outer")) {
      val native = AsOf.join(left, right, Seq("l_k", "l_v"), Seq("r_k", "r_v"),
          "l_t", "r_t", rightTieBreakCols = Seq("r_id"),
          joinType = jt, direction = dir)
        .select($"l_id", $"r_id")
        .collect().map(norm).sorted.toSeq
      val timeCond = if (dir == "backward") $"r_t" <= $"l_t" else $"r_t" >= $"l_t"
      val pick = if (dir == "backward") max_by($"r_id", struct($"r_t", $"r_id"))
                 else min_by($"r_id", struct($"r_t", $"r_id"))
      val oracle = left.join(right,
          $"l_k" === $"r_k" && $"l_v" === $"r_v" && timeCond, jt)
        .groupBy($"l_id").agg(pick.as("r_id"))
        .collect().map(norm).sorted.toSeq
      assert(native == oracle, s"composite-key mismatch: $dir $jt")
    }
  }

  test("DATE time columns run the generated int fast path (backward, no tolerance)") {
    import java.sql.Date
    val l = Seq((1L, "A", Date.valueOf("2024-03-15")),
                (2L, "A", Date.valueOf("2024-01-01")),
                (3L, "B", Date.valueOf("2024-06-01")))
      .toDF("l_id", "l_k", "l_d")
    val r = Seq((10L, "A", Date.valueOf("2024-02-01")),
                (11L, "A", Date.valueOf("2024-03-15")),
                (12L, "B", Date.valueOf("2024-07-01")))
      .toDF("r_id", "r_k", "r_d")
    val out = AsOf.join(l, r, Seq("l_k"), Seq("r_k"), "l_d", "r_d", Seq("r_id"))
      .select($"l_id", $"r_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    // 1 -> equal-date 11; 2 -> nothing at-or-before; 3 -> nothing (12 later)
    assert(out == Seq((1L, 11L)))
  }

  test("chained as-of joins compose (lower join inside the upper's stage subtree)") {
    // enrich trades with quotes, then enrich the result with a second
    // reference stream — the lower AsOfJoinExec ends up inside the
    // upper stage's child tree where its produce is never called; it
    // must still execute via its own doExecute under the upper's sorts
    val refs = Seq((201L, "A", 12L), (202L, "A", 28L), (203L, "B", 10L))
      .toDF("f_id", "f_sym", "f_ts")
    val step1 = AsOf.join(trades, quotes, Seq("t_sym"), Seq("sym"),
      "t_ts", "q_ts", Seq("q_id"))
    val step2 = AsOf.join(step1, refs, Seq("t_sym"), Seq("f_sym"),
      "t_ts", "f_ts", Seq("f_id"))
      .select($"t_id", $"q_id", $"f_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    // step1 keeps trades 101,102,103,104; step2 backward on refs:
    // 101(A,10) -> none before 12 -> dropped; 102(A,25) -> 201(12);
    // 103(A,99) -> 202(28); 104(B,15) -> 203(10)
    assert(step2 == Seq((102L, 3L, 201L), (103L, 4L, 202L), (104L, 5L, 203L)))
  }

  test("driver-side rejection: ambiguous columns, date tolerance, string tolerance") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "t")
    // duplicate column name on one side → ambiguous, not first-match
    val dup = l.select($"k", $"t", $"t".as("k"))
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(dup, r, Seq("k"), Seq("k"), "t", "t")
    }
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // DATE time column with tolerance → unit-mismatch rejected
    val ld = Seq((1L, java.sql.Date.valueOf("2024-01-02"))).toDF("k", "d")
    val rd = Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("k", "d")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(ld, rd, Seq("k"), Seq("k"), "d", "d", toleranceMicros = 1000L)
    }
    assert(e2.getMessage.contains("DATE"), e2.getMessage)
    // non-integral (string) time column with nearest → rejected
    val ls = Seq((1L, "b")).toDF("k", "t")
    val rs = Seq((1L, "a")).toDF("k", "t")
    val e3 = intercept[IllegalArgumentException] {
      AsOf.join(ls, rs, Seq("k"), Seq("k"), "t", "t", direction = "nearest")
    }
    assert(e3.getMessage.contains("integral"), e3.getMessage)
    // but plain backward on a string time column is legal (boxed path)
    assert(AsOf.join(ls, rs, Seq("k"), Seq("k"), "t", "t").count() == 1)
  }
}
