#!/usr/bin/env python3
"""Summarize a tools/thread_ab.sh run: per-(query, threads), the
profile of the MIN-exec_s rep (wall/exec_s/cpu_s all read from that
single best rep — not per-metric minima across reps; exec_all lists
every rep's exec_s so the spread stays visible), plus the derived
contention evidence —

  work_ratio(N)  = exec_s(N)  / exec_s(min threads)
  cpu_ratio(N)   = cpu_s(N)   / cpu_s(min threads)
  speedup(N)     = wall(min threads) / wall(N)
  per_core_eff   = speedup(N) / (N / min_threads)

Reading: the corpus, binary and plan widths are FIXED (thread_ab.sh
pins them), so exec_s is the same tasks doing the same work. If
exec_s/cpu_s rise with N while wall stops improving, threads are
stalling on the shared memory system — per-core throughput falls with
concurrency, which is the single-box contention signature (a cluster
adds memory systems with nodes, so the effect does not transfer).
If exec_s is flat and wall ~ exec_s/N, the work is scalable and any
residual scale exponent belongs to the plan.

Usage: tools/thread_ab_report.py <outdir> [--json artifact.json]
"""
import glob
import json
import re
import sys


def main(outdir, artifact=None):
    pts = {}  # (query, threads) -> list of profile dicts
    for log in glob.glob(f"{outdir}/*_c*_r*.log"):
        m = re.search(r"([a-z0-9_]+)_c(\d+)_r\d+\.log$", log)
        q, c = m.group(1), int(m.group(2))
        with open(log, errors="replace") as f:
            for line in f:
                if "PROFILE_JSON" in line:
                    j = json.loads(line.split("PROFILE_JSON", 1)[1])
                    pts.setdefault((q, c), []).append(j)
    out = {}
    for q in sorted({k[0] for k in pts}):
        cs = sorted(c for (qq, c) in pts if qq == q)
        base = min(cs)
        rows = []
        for c in cs:
            reps = pts[(q, c)]
            best = min(reps, key=lambda j: j["exec_s"])
            rows.append({
                "threads": c, "reps": len(reps),
                "wall_s": best["wall_s"], "exec_s": best["exec_s"],
                "cpu_s": best["cpu_s"],
                "exec_all": sorted(r["exec_s"] for r in reps),
                "spill_disk_mb": best["spill_disk_mb"],
            })
        b = rows[0]
        for r in rows:
            r["work_ratio"] = round(r["exec_s"] / b["exec_s"], 3)
            r["cpu_ratio"] = round(r["cpu_s"] / b["cpu_s"], 3)
            r["speedup"] = round(b["wall_s"] / r["wall_s"], 3)
            r["per_core_eff"] = round(
                r["speedup"] / (r["threads"] / b["threads"]), 3)
        out[q] = {"base_threads": base, "points": rows}
        print(f"\n{q} (base = {base} threads)")
        print(f"{'thr':>4} {'wall_s':>8} {'exec_s':>9} {'cpu_s':>9} "
              f"{'work_x':>7} {'cpu_x':>7} {'speedup':>8} {'eff':>6}")
        for r in rows:
            print(f"{r['threads']:>4} {r['wall_s']:>8.1f} {r['exec_s']:>9.1f} "
                  f"{r['cpu_s']:>9.1f} {r['work_ratio']:>7.2f} "
                  f"{r['cpu_ratio']:>7.2f} {r['speedup']:>8.2f} "
                  f"{r['per_core_eff']:>6.2f}")
    if artifact:
        with open(artifact, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"\nartifact written: {artifact}")


if __name__ == "__main__":
    art = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        art = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(args[0], art)
