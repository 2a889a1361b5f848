#!/bin/bash
# Fresh-JVM-per-point deep-scale measurement for the named queries.
#
# Why not measure these inside one long ScaleCurve session: wall-clock
# at sf30+ on this host swings 1.5-4x BETWEEN contexts (the same
# binary, same corpus d8@sf1 measured 4.1 s and 23.6 s inside one
# full-curve session, 28.1 s in a fresh patch session) — accumulated
# JVM/block-manager state and AQE join-strategy flips at borderline
# build sizes make late in-session points unreproducible. One JVM per
# (query, scale) point is the only shape where a re-run reproduces,
# and QueryProfile's PROFILE_JSON line also records exec_s (total
# executor run time) — the noise-robust work measure the exponent fit
# prefers over wall on a saturated 32-core box.
#
# Usage: tools/deep_profile.sh <outdir> <reps> <query> [query...]
# Scales: sf1 sf3 sf10 sf30 from target/scalecurve + sf100 for the
# deepest ops. Each (query, scale) runs <reps> times; the patcher
# (tools/patch_deepcurve.py) takes per-point minima.
set -u
OUT=$1; REPS=$2; shift 2
mkdir -p "$OUT"
# direct-JVM launch (r11): one sbt boot per point added ~30 s x
# points x reps of pure overhead AND left an sbt server competing
# with the measured JVM; java -cp against the compiled classes is the
# same classpath build.sbt runs with (compile first: sbt -batch compile)
OPENS=""
for P in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for P in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
SCALES=${DEEP_SCALES:-"sf1 sf3 sf10 sf30 sf100"}
for Q in "$@"; do
  for SF in $SCALES; do
    DIR=/root/repo/target/scalecurve/$SF
    [ -d "$DIR" ] || continue
    for R in $(seq 1 "$REPS"); do
      LOG="$OUT/${Q}_${SF}_r${R}.log"
      java $OPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" \
        -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
        graft.QueryProfile "$Q" "$DIR" > "$LOG" 2>&1
      grep -a PROFILE_JSON "$LOG" | tail -1
    done
  done
done
