package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed THREAD_AB.json artifact (tools/thread_ab.sh +
  * tools/thread_ab_report.py --json): the fixed-scale thread-scaling
  * A/B that settles the r8 open question — whether the d8/d22
  * sf30→sf100 exec_s exponents (1.28/1.47, with zero spill, linear
  * shuffle bytes and exponent-1.0 candidate counts) are the plan or
  * the box. The artifact holds, per op and thread count, exec_s /
  * cpu_s / wall minima over fresh-JVM reps with plan widths pinned,
  * so exec_s is the SAME tasks doing the SAME work.
  *
  * What the numbers showed (and these assertions keep pinned): total
  * task time RISES steeply with concurrency at fixed work — threads
  * stall on the shared memory system — so per-core throughput falls
  * with thread count and the top-decade growth is single-box memory
  * contention, not plan degeneration. On a cluster, nodes add memory
  * systems with cores; this box cannot.
  */
class ThreadAbSpec extends AnyFunSuite {

  private lazy val json: String = {
    val p = java.nio.file.Paths.get("THREAD_AB.json")
    assert(java.nio.file.Files.exists(p),
      "THREAD_AB.json missing — run tools/thread_ab.sh + " +
        "tools/thread_ab_report.py --json THREAD_AB.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  /** (threads, exec_s, wall_s) points for one op, ascending threads. */
  private def points(op: String): Seq[(Int, Double, Double)] = {
    val i = json.indexOf("\"" + op + "\"")
    assert(i >= 0, s"$op missing from THREAD_AB.json")
    // bracket-balanced end of the points ARRAY: each point nests its
    // own exec_all list, so the first "]" is not the array's end
    val start = json.indexOf('[', json.indexOf("\"points\"", i))
    var depth = 0
    var j = start
    var end = -1
    while (end < 0) {
      json.charAt(j) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = j
        case _ =>
      }
      j += 1
    }
    val sec = json.substring(i, end)
    // per-point fields are alphabetized by the json dump (sort_keys)
    val exec = """"exec_s": ?([0-9.]+)""".r.findAllMatchIn(sec)
      .map(_.group(1).toDouble).toSeq
    val thr = """"threads": ?([0-9]+)""".r.findAllMatchIn(sec)
      .map(_.group(1).toInt).toSeq
    val wall = """"wall_s": ?([0-9.]+)""".r.findAllMatchIn(sec)
      .map(_.group(1).toDouble).toSeq
    assert(exec.size == thr.size && wall.size == thr.size,
      s"ragged artifact for $op")
    thr.lazyZip(exec).lazyZip(wall).toSeq.sortBy(_._1)
  }

  test("fixed work costs far more task-time under full concurrency (box, not plan)") {
    for (op <- Seq("d8_prefix_join", "d22_best_match")) {
      val pts = points(op)
      assert(pts.size >= 3, s"$op: need >=3 thread counts, got $pts")
      val (loT, loE, _) = pts.head
      val (hiT, hiE, _) = pts.last
      assert(hiT >= 4 * loT, s"$op: thread range too narrow ($loT..$hiT)")
      val workRatio = hiE / loE
      // the measured values are ~3.1 (d8) / ~2.9 (d22); anything
      // meaningfully above 1 already proves contention — 1.5 leaves
      // host-mode room while still failing if the effect ever
      // disappears (which would re-open the plan question)
      assert(workRatio > 1.5,
        s"$op: exec_s ratio $workRatio at ${hiT}v$loT threads — " +
          "contention signature gone; the top-decade exponent needs " +
          "a plan-side explanation again")
    }
  }

  test("wall speedup saturates well below linear (per-core throughput falls)") {
    for (op <- Seq("d8_prefix_join", "d22_best_match")) {
      val pts = points(op)
      val (loT, _, loW) = pts.head
      val (hiT, _, hiW) = pts.last
      val speedup = loW / hiW
      val linear = hiT.toDouble / loT
      assert(speedup < linear / 2,
        s"$op: speedup $speedup vs linear $linear — scaling is " +
          "better than the contention story this artifact documents")
    }
  }
}
