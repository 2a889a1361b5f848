#!/usr/bin/env python3
"""Splice fresh-JVM deep-series measurements into SCALECURVE.json.

Reads the PROFILE_JSON lines from a tools/deep_profile.sh output dir,
takes the per-(query, scale) MIN across reps for wall and exec, and
rewrites the named queries' deep_ops entries: each series point gains
an "exec_s" field (total executor run time — the noise-robust work
measure), and the entry gains "exp_exec_top2" (exponent fitted on
exec_s between the two largest scales) alongside the wall-based
"exp_top2"/"wall_ratio_top2". Point shape stays {"sf","n","sec",...}
so ScaleCurveSpec's regex keeps reading the committed artifact.

Usage: tools/patch_deepcurve.py <profile_outdir> <query> [query...]
"""
import glob
import os
import json
import math
import re
import sys

CURVE = "/root/repo/SCALECURVE.json"
ORDER = ["sf1", "sf3", "sf10", "sf30", "sf100", "sf300", "sf1000"]


def main(outdir, queries):
    with open(CURVE) as f:
        curve = json.load(f)
    deep = curve["deep_ops"]
    for q in queries:
        pts = {}
        for log in glob.glob(f"{outdir}/{q}_*.log"):
            sf = re.search(r"_(sf[0-9.]+)_r\d+\.log$", log).group(1)
            with open(log, errors="replace") as f:
                for line in f:
                    if "PROFILE_JSON" in line:
                        j = json.loads(line.split("PROFILE_JSON", 1)[1])
                        cur = pts.setdefault(sf, j)
                        if j["wall_s"] < cur["wall_s"]:
                            pts[sf] = j
        assert pts, f"no PROFILE_JSON for {q} under {outdir}"
        if q in deep:
            ref = deep[q]
        else:
            # first deep entry for this op: inherit row counts from a
            # committed entry OVER THE SAME TABLE (corpora are shared
            # per table, so n per scale transfers). The table must be
            # declared here — silently defaulting to documents would
            # publish a wrong exponent for an events/embeddings op.
            table_of = {"d16_minhash_calibration": "documents",
                        "d23_semdedup_adaptive": "embeddings",
                        "d25_semdedup_hier": "embeddings",
                        "n10_ivf_pq": "embeddings"}
            assert q in table_of, (
                f"{q} has no committed deep entry and no table declared "
                f"in patch_deepcurve.table_of — add it (the row counts "
                f"per scale are inherited from that table's entries)")
            donors = [e for e in deep.values()
                      if e["table"] == table_of[q]]
            if donors:
                ref = {"table": table_of[q], "series": donors[0]["series"]}
            else:
                # first entry EVER over this table: read the row count
                # straight from each corpus parquet footer (metadata
                # only — no scan, no Spark), so an embeddings-table op
                # can seed the ladder without a counting pass
                import pyarrow.parquet as pq
                import glob as _glob
                series = []
                for sf in ORDER:
                    path = f"/root/repo/target/scalecurve/{sf}/{table_of[q]}.parquet"
                    parts = _glob.glob(f"{path}/*.parquet")
                    if not parts and os.path.exists(path):
                        parts = [path]
                    if not parts:
                        continue
                    n = sum(pq.ParquetFile(p).metadata.num_rows
                            for p in parts)
                    series.append({"sf": sf, "n": n})
                ref = {"table": table_of[q], "series": series}
        old = {p["sf"]: p["n"] for p in ref["series"]}
        # row-count fallback for scales this entry has never carried:
        # corpora are shared per table, so any committed entry over the
        # same table donates its n (lets an entry EXTEND its ladder —
        # e.g. d16 sf3/sf30 -> the full sf1..sf100 ladder — without a
        # separate counting pass)
        donated = {p["sf"]: p["n"]
                   for e in deep.values() if e["table"] == ref["table"]
                   for p in e["series"]}
        series = []
        for sf in ORDER:
            if sf not in pts:
                continue
            j = pts[sf]
            n = old.get(sf, donated.get(sf))
            if n is None:
                # scale not in any same-table series (e.g. the first op
                # to reach sf1000): parquet footer metadata, no scan
                import pyarrow.parquet as pq
                import glob as _glob
                path = (f"/root/repo/target/scalecurve/{sf}/"
                        f"{ref['table']}.parquet")
                parts = _glob.glob(f"{path}/*.parquet") or (
                    [path] if os.path.exists(path) else [])
                if not parts:
                    raise SystemExit(f"{q} {sf}: no row count and no corpus")
                n = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
            series.append({"sf": sf, "n": n, "sec": j["wall_s"],
                           "exec_s": j["exec_s"],
                           "spill_disk_mb": j["spill_disk_mb"]})
        (n1, s1, e1), (n2, s2, e2) = [
            (p["n"], p["sec"], p["exec_s"]) for p in series[-2:]]
        deep[q] = {
            "table": ref["table"],
            "methodology": "fresh-jvm-per-point min-of-reps (QueryProfile)",
            "series": series,
            "exp_top2": round(math.log(s2 / s1) / math.log(n2 / n1), 4),
            "wall_ratio_top2": round(s2 / s1, 4),
            "exp_exec_top2": round(math.log(e2 / e1) / math.log(n2 / n1), 4),
        }
        print(q, json.dumps(deep[q]["series"]), "exp", deep[q]["exp_top2"],
              "exp_exec", deep[q]["exp_exec_top2"])
    with open(CURVE, "w") as f:
        json.dump(curve, f, separators=(",", ":"))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
