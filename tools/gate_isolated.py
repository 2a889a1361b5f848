#!/usr/bin/env python3
"""Oracle gate with per-query PROCESS isolation, for big corpora.

At sf10 (500k docs) the heaviest oracles can exceed DuckDB's memory
limit, and an OOM'd DuckDB wedges its process allocator — even a
fresh connection in the same process then fails byte-sized
allocations, cascading spurious failures across the rest of the slice
(observed: 1487-byte "bad allocation" on queries that pass alone).
Running tools/check.py once per query in a fresh process makes every
verdict independent: a genuinely over-limit oracle records ORACLE-OOM
for itself and nothing else.

Usage: tools/gate_isolated.py <sfDir> <outDir> <artifact.json>
                              [timeout_s per query, default 1800] [--merge]

--merge: fold this run's per-query verdicts into an EXISTING artifact
(same sf corpus) instead of replacing it — used to extend the gate
slice (e.g. the heavy x/c queries) without re-running the original
oracles. Counts and the vacuous list are recomputed over the union.
"""
import glob
import json
import os
import subprocess
import sys

def corpus_scheme(sf):
    """Concatenated generation-marker contents for the corpus — the
    scheme fingerprint recorded in the artifact and asserted on
    --merge (r10 advice: same-path merges could silently mix verdicts
    computed against pre- and post-v2 corpus bytes; the path check
    alone can't see a regeneration)."""
    parts = []
    # _EVENTS_DONE included (r13 advice): the events table gates q24's
    # sf30 rung, and a regeneration under a bumped scheme must change
    # this fingerprint or old- and new-event verdicts could mix
    for m in ("_GEN_DONE", "_EMB_DONE", "_GEN_TPCH_DONE", "_EVENTS_DONE"):
        p = os.path.join(sf, m)
        if os.path.exists(p):
            with open(p) as f:
                parts.append(f"{m}={f.read().strip() or '(unversioned)'}")
    return "; ".join(parts) or "(no generation markers: driver corpus)"


def main(sf, out, art, timeout, merge=False):
    names = [os.path.basename(d)
             for d in sorted(glob.glob(os.path.join(out, "*")))
             if os.path.isdir(d)]
    here = os.path.dirname(os.path.abspath(__file__))
    queries = {}
    for q in names:
        pf = f"{art}.part.{q}.json"
        if os.path.exists(pf):
            os.remove(pf)
        detail = None
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "check.py"),
                 sf, out, pf, f"--only={q}"],
                timeout=timeout, capture_output=True, text=True)
            if not os.path.exists(pf):
                tail = (r.stderr or "").strip().splitlines()
                detail = (f"ORACLE-CRASH exit={r.returncode} "
                          f"{tail[-1] if tail else '(no stderr)'}")
        except subprocess.TimeoutExpired:
            detail = f"ORACLE-TIMEOUT >{timeout}s"
        if detail is None:
            with open(pf) as f:
                queries[q] = json.load(f)["queries"][q]
            os.remove(pf)
        else:
            queries[q] = {"pass": False, "rows": None, "detail": detail}
        print(f"{q}: {queries[q]['detail']}", flush=True)
    if merge:
        # a typo'd artifact path must not silently degrade the merge
        # into a replace (the fresh file would impersonate the full gate)
        assert os.path.exists(art), f"--merge: no existing artifact at {art}"
        with open(art) as f:
            old = json.load(f)
        assert os.path.realpath(old["sf_dir"]) == os.path.realpath(sf), \
            f"--merge across corpora: {old['sf_dir']} vs {sf}"
        # same path is not enough: the corpus may have been REGENERATED
        # under a different scheme since the old verdicts were computed.
        # Subset check, not equality (r13): COMPLETING a corpus with new
        # tables (events/TPC-H markers appearing) leaves every old
        # verdict's bytes untouched — only a marker the old artifact
        # RECORDED changing value means regeneration.
        old_scheme = old.get("corpus_scheme")
        def scheme_map(s):
            return dict(p.split("=", 1) for p in s.split("; ") if "=" in p)
        new_scheme = corpus_scheme(sf)
        changed = old_scheme is not None and any(
            scheme_map(new_scheme).get(m) != v
            for m, v in scheme_map(old_scheme).items())
        assert not changed, (
            f"--merge across corpus generations: artifact was gated on\n"
            f"  {old_scheme}\nbut {sf} now carries\n  {new_scheme}\n"
            f"— re-run the original slice on the current corpus instead")
        queries = {**old["queries"], **queries}
    npass = sum(1 for v in queries.values() if v["pass"])
    # a 0-row pass is exact but VACUOUS (both engines agree on empty);
    # list those explicitly so the artifact says what the gate proved
    # instead of leaving it to prose (r9 verdict: n16 passed empty at
    # sf10 undisclosed) — and REQUIRE an individual justification from
    # tools/vacuous_notes.json, embedded in the artifact, for each one
    vacuous = sorted(q for q, v in queries.items()
                     if v["pass"] and v.get("rows") == 0)
    notes_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "vacuous_notes.json")
    notes = json.load(open(notes_path)) if os.path.exists(notes_path) else {}
    missing = [q for q in vacuous if q not in notes]
    assert not missing, (
        f"vacuous gate rows without a justification in {notes_path}: "
        f"{missing} — explain each empty-but-exact row or fix the corpus")
    vacuous_notes = {q: notes[q] for q in vacuous}
    doc = {"sf_dir": sf, "mode": "per-query process isolation",
           "corpus_scheme": corpus_scheme(sf),
           "timeout_s": timeout,
           "n_pass": npass, "n_total": len(queries),
           "n_rows_only": sum(1 for v in queries.values()
                              if v["detail"].startswith("NO-ORACLE")),
           "vacuous": vacuous,
           "vacuous_notes": vacuous_notes,
           "queries": queries}
    with open(art, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"\n{npass}/{len(queries)} pass; artifact written: {art}")

if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--merge"]
    main(argv[0], argv[1], argv[2],
         int(argv[3]) if len(argv) > 3 else 1800,
         merge="--merge" in sys.argv)
