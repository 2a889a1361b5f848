package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed CORRECTNESS_SF10.json artifact — the r9 exact
  * oracle gate for the heaviest d/t/n/g queries at sf10 (500k docs,
  * 100 structure-preserving copies of sf0.1; see GenSf10Gate and the
  * per-query-isolated runner tools/gate_isolated.py). The driver's
  * own gate runs at sf0.01 and ~sf1; this artifact is the evidence
  * that the heavy-family semantics stay EXACT a further decade up,
  * so it must not silently rot or lose members.
  */
class Sf10GateSpec extends AnyFunSuite {

  private lazy val doc: String = {
    val p = java.nio.file.Paths.get("CORRECTNESS_SF10.json")
    assert(java.nio.file.Files.exists(p),
      "CORRECTNESS_SF10.json missing — run GenSf10Gate + Verify + " +
        "tools/gate_isolated.py (recipe in .claude/skills/verify)")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("the sf10 heavy-slice artifact is complete and all-pass") {
    val passes = """"pass": ?(true|false)""".r
      .findAllMatchIn(doc).map(_.group(1)).toSeq
    assert(passes.size >= 22, s"only ${passes.size} gated queries recorded")
    assert(passes.forall(_ == "true"),
      "a recorded sf10 gate result is non-pass — re-run the gate and " +
        "fix or explain before re-committing the artifact")
    // the slice must keep its heaviest members — the ops whose scale
    // claims the artifact exists to back
    for (q <- Seq("d8_prefix_join", "d22_best_match", "d9_dup_clusters",
                  "t14_corpus_pipeline", "n10_ivf_pq", "g5_label_prop"))
      assert(doc.contains("\"" + q + "\""), s"$q missing from the sf10 gate")
  }
}
