#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [artifact.json]

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares (columns sorted by name, rows sorted, exact value
equality; small report of diffs). Mirrors the driver contract in
SURVEY.md §5 so mismatches are caught before the round gate runs.

The optional third arg writes a CORRECTNESS-style JSON artifact
({query: {pass, rows, detail}}) — used to commit committable evidence
for off-driver gates (e.g. the sf10 heavy-slice gate).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    # NO container normalization: the driver's comparer sorts raw
    # values and dies on ndarray/list cells, so this stand-in must be
    # exactly as strict — a query emitting an array/map/struct column
    # fails HERE, not at the round gate (round-6 u3 lesson).
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def connect(sf_dir):
    con = duckdb.connect()
    # Big-corpus discipline (the sf10 gate OOM'd without it): an
    # in-memory DuckDB has NO temp directory, so blocking operators
    # cannot spill and a corpus-sized join dies at the memory limit —
    # and once one oracle OOMs, the wedged allocator spuriously fails
    # even byte-sized allocations for every later query on the same
    # connection (observed: 1487-byte "bad allocation" on queries that
    # pass standalone). Give it a spill dir and a cap below the host's
    # RAM so Spark-side leftovers don't push the process into the OOM
    # killer.
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCK_MEM", "80GB"))
    # fewer threads = fewer concurrent per-thread operator states in
    # blocking operators — materially lowers peak memory on the
    # corpus-sized oracles, and the gate is correctness-, not
    # latency-bound
    con.execute("SET threads=%d"
                % int(os.environ.get("GRAFT_DUCK_THREADS", "16")))
    # the compare sorts rows itself, so insertion order is meaningless
    # here — relaxing it lets DuckDB stream large joins/aggregations
    # instead of buffering them for order (its documented big-ETL OOM
    # lever)
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table: directory of part files
            src = f"read_parquet('{p}/*.parquet')"
            part = glob.glob(os.path.join(p, "*.parquet"))[0]
        elif os.path.exists(p):
            src = f"read_parquet('{p}')"
            part = p
        else:
            continue
        sel = "*"
        if t == "events":
            # The driver corpus stores ts as TIMESTAMP(NANOS), which
            # DuckDB surfaces as a timestamp; Spark-GENERATED corpora
            # (scale-curve replicas) store int64 epoch-nanos instead,
            # because Spark has no nanos timestamp type to write.
            # Normalize to the timestamp shape the oracles bind against
            # — the same ts div 1000 the Spark side does in Tables.
            if str(pq.read_schema(part).field("ts").type) == "int64":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    return con


def main(sf_dir, out_dir, artifact=None, only=None):
    con = connect(sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        if only is not None and name not in only:
            continue
        print(f"... {name}", flush=True)
        try:
            got = pq.read_table(qdir).to_pandas()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__}: {e}"
            # an OOM'd connection stays memory-wedged — rebuild it so
            # one over-limit oracle cannot cascade failures onto the
            # rest of the slice
            try:
                con.close()
            except Exception:
                pass
            con = connect(sf_dir)
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWS-MISMATCH spark={len(g)} duck={len(e)}"
        else:
            # The driver hashes rendered values, so int64 12345 vs DuckDB
            # HUGEINT-as-float64 12345.0 is a driver FAIL even when the
            # numbers are equal. Mirror that: numeric "kind" must agree
            # (int-vs-float drift fails here, not just at the round gate).
            kind_drift = [
                c for c in g.columns
                if {g[c].dtype.kind, e[c].dtype.kind} == {"i", "f"}
                or {g[c].dtype.kind, e[c].dtype.kind} == {"u", "f"}
            ]
            if kind_drift:
                results[name] = (
                    "DTYPE-MISMATCH "
                    + ", ".join(f"{c}: spark={g[c].dtype} duck={e[c].dtype}"
                                for c in kind_drift))
                continue
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=True)
                results[name] = f"PASS rows={len(g)}"
            except AssertionError as ex:
                msg = str(ex).replace("\n", " | ")[:300]
                results[name] = f"VALUE-MISMATCH {msg}"
    npass = sum(1 for v in results.values() if v.startswith("PASS"))
    nora = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    # A 0-row hash-match is a VACUOUS pass: both engines agreeing on
    # emptiness proves nothing about the operator's value semantics
    # (d6's 0.5 cosine cut passed three rounds of gates this way
    # before the r11 sweep noticed). Every vacuous row must carry a
    # human-written justification in tools/vacuous_notes.json — the
    # same contract gate_isolated.py enforces for the sf10 rung — and
    # the note rides in the artifact so a later reader never mistakes
    # an empty result for exercised coverage.
    vacuous = sorted(
        q for q, v in results.items()
        if (v.startswith("PASS") or v.startswith("NO-ORACLE"))
        and "rows=0" in v)
    notes_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "vacuous_notes.json")
    with open(notes_path) as f:
        notes = json.load(f)
    missing = [q for q in vacuous if q not in notes]
    for k, v in sorted(results.items()):
        tag = " (VACUOUS)" if k in vacuous else ""
        print(f"{'OK ' if v.startswith('PASS') else '** '}{k}: {v}{tag}")
    print(f"\n{npass}/{len(results)} pass ({nora} rows-only, "
          f"{len(vacuous)} vacuous)")
    if missing:
        print(f"** vacuous passes without a justification in {notes_path}: "
              f"{missing} — add notes or fix the queries")
        return 1
    if artifact:
        doc = {
            "sf_dir": sf_dir,
            "n_pass": npass, "n_rows_only": nora, "n_total": len(results),
            "vacuous": vacuous,
            "vacuous_notes": {q: notes[q] for q in vacuous},
            "queries": {
                k: {"pass": v.startswith("PASS"),
                    "rows": int(v.split("rows=")[1]) if "rows=" in v else None,
                    "detail": v}
                for k, v in sorted(results.items())},
        }
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"artifact written: {artifact}")
    return 0 if npass + nora == len(results) else 1


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    for a in list(argv):
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
            argv.remove(a)
    sys.exit(main(argv[0], argv[1],
                  argv[2] if len(argv) > 2 else None, only))
