#!/usr/bin/env python3
"""Adjudicate a driver bench pass's regression/ratchet flags.

The recurring round shape (r10-r13, four times): the round driver's
bench pass runs on a shared, epoch-noisy host and flags a handful of
queries as regressions (vs the committed canonical map) or ratchets
(vs the best-ever anchor). Each flag must be adjudicated before the
driver map becomes "prev": re-measure the query under the isolated
fresh-JVM protocol (tools/isolated_bench.sh — one JVM per rep,
min-of-3 in-JVM, canonical CPUS=4) on a quiet host and compare
against the anchor and the committed canonical value.

This tool automates that protocol end to end:

    python3 tools/adjudicate.py BENCH_r14.json            # plan only
    python3 tools/adjudicate.py BENCH_r14.json --run      # measure
    python3 tools/adjudicate.py BENCH_r14.json --run --reps 3 \
        --sf /root/testdata/sf0.1

It parses the flag set out of the driver capture (the last
{"metric":"total",...} line inside the `tail` blob), runs each
distinct flagged query through isolated_bench.sh TOGETHER WITH the
epoch-control queries (see CONTROLS — this host's wall clock moves in
1.0-1.9x epochs that shift everything together, so a lone isolated
min is uninterpretable), normalizes by the controls' median shift
against the committed canonical map, and prints a markdown triage
table ready for the round notes, with a verdict per query:

  - CONTENTION  isolated min reproduces the anchor (or the committed
                canonical value) — the driver flag was host noise;
                anchor KEPT.
  - ANCHOR SUSPECT  neither the isolated min nor the committed
                canonical comes near the anchor — the anchor itself
                is likely stale (the r13 lesson: ~50 anchors were
                count()-era fiction); propose RESET to the honest min.
  - REGRESSION  the isolated min confirms the slowdown against an
                anchor the canonical map CAN reproduce — a real
                plan-level change; investigate before committing.

Verdicts here are advisory: the table states the evidence (anchor /
canonical / isolated numbers) so the round notes can record the
final call.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tolerances, in fractional wall-clock terms, chosen from the observed
# epoch behaviour on this host (documented in ROUND12/13 notes): quiet
# fresh-JVM reps of an unchanged query land within ~15% of their
# anchor; the 1.4-1.9x band is the contention tail.
REPRODUCES = 1.15   # isolated min within 15% of a value "reproduces" it
UNREACHABLE = 1.50  # nothing honest within 1.5x => the anchor is suspect

# Epoch controls: stable queries nobody is changing, measured in the
# SAME JVM as each flagged query. This host's wall-clock runs in
# multi-minute epochs that shift the whole surface 1.0-1.9x together
# (r9-r14, measured repeatedly) — a flagged query's isolated min is
# only interpretable against what the same epoch does to known-good
# queries. The first version of this tool skipped the control and
# convicted all four r13 flags as REGRESSION during a slow epoch whose
# controls would have read ~1.5x. Five controls across plan classes
# (agg, graph, bucketed join, UDF-free text, window) so one query's
# own variance cannot masquerade as the epoch.
CONTROLS = ["a6_corr", "g1_pagerank", "c16_bucketed_join",
            "t23_classifier", "w5_ntile_dense"]


def bench_total_line(capture_path):
    """Extract the final {"metric":"total",...} JSON from a driver
    capture (BENCH_rN.json with a `tail` stdout blob) or from a raw
    bench stdout file."""
    with open(capture_path) as f:
        raw = f.read()
    try:
        tail = json.loads(raw).get("tail", raw)
    except json.JSONDecodeError:
        tail = raw
    lines = [l for l in tail.split("\n") if '"metric"' in l]
    if not lines:
        return None
    return json.loads(re.sub(r"^\[info\] ", "", lines[-1].strip()))


def flagged_queries(total):
    """Distinct flagged query names, preserving first-seen order."""
    seen, out = set(), []
    for fl in (total.get("regressions") or []) + (total.get("ratchets") or []):
        if fl["q"] not in seen:
            seen.add(fl["q"])
            out.append(fl["q"])
    return out


def committed_canonical():
    """Per-query map from HEAD's BENCH_PER_QUERY.json (the committed
    canonical — the worktree copy may be driver-overwritten, which is
    the very situation this tool adjudicates)."""
    p = subprocess.run(["git", "show", "HEAD:BENCH_PER_QUERY.json"],
                       capture_output=True, text=True, cwd=REPO)
    if p.returncode != 0:
        sys.exit("git show HEAD:BENCH_PER_QUERY.json failed")
    return json.loads(p.stdout)["queries"]


def isolated_min(query, sf, reps, canon):
    """Run tools/isolated_bench.sh for the query PLUS the epoch
    controls in the same JVMs. Returns (raw_min, per_rep_raw,
    epoch_shift, normalized_min) where epoch_shift is the median over
    controls of isolated_control_min / committed_canonical_control —
    the single-query analog of Bench's full-surface host_shift."""
    controls = [c for c in CONTROLS if c != query and c in canon]
    p = subprocess.run(["bash", "tools/isolated_bench.sh", sf, str(reps),
                        query] + controls,
                       capture_output=True, text=True, cwd=REPO)
    per_rep, ctrl = [], {c: [] for c in controls}
    for line in p.stdout.splitlines():
        if '"queries"' not in line:
            continue
        j = json.loads(re.sub(r"^\[info\] ", "", line.strip()))
        v = j.get("queries", {}).get(query)
        if v is not None:
            per_rep.append(v)
        for c in controls:
            cv = j.get("queries", {}).get(c)
            if cv is not None:
                ctrl[c].append(cv)
    if not per_rep:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        sys.exit(f"isolated_bench.sh produced no value for {query}")
    shifts = sorted(min(v) / canon[c] for c, v in ctrl.items() if v)
    shift = shifts[len(shifts) // 2] if shifts else 1.0
    raw = min(per_rep)
    return raw, per_rep, shift, raw / max(shift, 1e-9)


def verdict(anchor, canonical, iso):
    if anchor is not None and iso <= anchor * REPRODUCES:
        return ("CONTENTION", "isolated min reproduces the anchor; "
                "driver flag was host noise — anchor KEPT")
    # anchor-staleness check BEFORE the canonical-reproduction check:
    # when neither the isolated min nor the committed canonical can
    # come near the anchor, "reproduces canonical" would be true but
    # useless — the ratchet will re-fire every pass until the anchor
    # is reset (the c25 r13 shape: count()-era anchor 0.116, honest
    # floor ~0.3)
    if anchor is not None and iso > anchor * UNREACHABLE and \
       (canonical is None or canonical > anchor * UNREACHABLE):
        return ("ANCHOR SUSPECT", "neither isolated nor canonical comes "
                f"within {UNREACHABLE}x of the anchor — likely stale; "
                f"propose RESET to honest min {iso:.3f}")
    if canonical is not None and iso <= canonical * REPRODUCES:
        return ("CONTENTION", "isolated min reproduces the committed "
                "canonical; driver flag was host noise — anchor KEPT")
    # absolute-delta guard, mirroring Bench.regressionWatch: a flag
    # needs BOTH a >1.2x normalized ratio AND >=0.3 s of absolute
    # movement — sub-second queries wobble tens of milliseconds
    # between honest epochs, which no plan change explains
    ref = canonical if canonical is not None else anchor
    if ref is not None and iso - ref < 0.3:
        return ("CONTENTION", f"residual delta vs committed {iso - ref:+.3f}s "
                "is under regressionWatch's 0.3 s absolute guard — "
                "epoch noise, not a plan change; anchor KEPT")
    return ("REGRESSION", "isolated min confirms a slowdown against a "
            "reproducible anchor — investigate the plan before committing")


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("capture", help="BENCH_rN.json driver capture (or raw bench stdout)")
    ap.add_argument("--run", action="store_true",
                    help="actually run isolated_bench.sh (default: print the plan)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None,
                    help="comma list to adjudicate instead of the capture's flags")
    args = ap.parse_args()

    # A capture can arrive with NO parseable metric line at all: the
    # r14 driver tail was truncated MID-LINE (the pre-r15 bench put
    # the unbounded flag arrays on the final line), leaving only flag
    # fragments. --queries is the operator-supplied recovery path —
    # flag names regex'd out of the fragments — so only an explicit
    # flag list may proceed without a total line.
    total = bench_total_line(args.capture)
    if total is None:
        if not args.queries:
            sys.exit(f"no bench total line found in {args.capture} "
                     "(truncated capture? pass --queries explicitly)")
        total = {}
    qs = args.queries.split(",") if args.queries else flagged_queries(total)
    if not qs:
        print("no regressions or ratchets flagged — nothing to adjudicate")
        return

    best = json.load(open(os.path.join(REPO, "BENCH_BEST.json")))["queries"]
    canon = committed_canonical()
    flags = {f["q"]: f for f in
             (total.get("regressions") or []) + (total.get("ratchets") or [])}

    tv = total.get("value")
    print(f"driver pass: total={tv if tv is None else format(tv, '.2f')} "
          f"host_shift={total.get('host_shift')} flags={qs}\n")
    if not args.run:
        for q in qs:
            ctl = " ".join(c for c in CONTROLS if c != q)
            print(f"  would run: bash tools/isolated_bench.sh {args.sf} "
                  f"{args.reps} {q} {ctl}")
        print("\nre-run with --run on a QUIET host (no concurrent sbt/Spark).")
        return

    rows = []
    for q in qs:
        raw, vals, shift, norm = isolated_min(q, args.sf, args.reps, canon)
        v, why = verdict(best.get(q), canon.get(q), norm)
        rows.append((q, best.get(q), canon.get(q), flags.get(q, {}).get("now"),
                     raw, vals, shift, norm, v, why))

    print("| query | anchor | canonical | driver flag | isolated raw "
          "| epoch shift | isolated norm | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for q, a, c, fl, raw, vals, shift, norm, v, why in rows:
        fmt = lambda x: "—" if x is None else f"{x:.3f}"
        print(f"| {q} | {fmt(a)} | {fmt(c)} | {fmt(fl)} | {raw:.3f} "
              f"(reps: {', '.join(f'{x:.3f}' for x in vals)}) | "
              f"{shift:.2f} | **{norm:.3f}** | {v}: {why} |")


if __name__ == "__main__":
    main()
