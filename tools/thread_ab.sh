#!/bin/bash
# Thread-scaling A/B at FIXED scale — the round-8 verdict's decisive
# experiment for the residual d8/d22 top-decade exponents (wall 1.23/
# 1.41 despite zero spill, linear shuffle bytes, exponent-1.0000
# candidate counts). Hypothesis under test: the residual CPU-per-byte
# growth is the single box's shared memory hierarchy (32 threads on
# one LLC + one memory bus), not the plan.
#
# Design: hold the CORPUS (sf30), the BINARY, and the PLAN WIDTHS
# fixed; vary ONLY executor concurrency (local[N] threads) via
# SPARK_GRAFT_CPUS. Plan widths are pinned through SPARK_GRAFT_CONF:
#   - spark.sql.shuffle.partitions=32      (scaleParts floor + non-AQE)
#   - spark.default.parallelism=32         (file-split sizing + AQE
#                                           parallelism floor input)
#   - ...coalescePartitions.parallelismFirst=false
#     (AQE coalesces purely by the 16 MB advisory, so reducer counts
#      are byte-proportional and IDENTICAL across thread counts —
#      with the default `true` AQE floors widths at core count and the
#      plan would vary with N, confounding the A/B)
# Per-stage task counts printed by QueryProfile verify the pin held.
#
# Reading the result: exec_s is the sum of task run time — pure work.
#   exec_s flat across N  + wall ~ exec_s/N  -> perfectly scalable CPU
#     work -> the sf30->sf100 exponent is NOT concurrency contention
#     -> the plan owes the exponent (restructure d22's argmax).
#   exec_s RISES with N (same tasks take longer when 32 run at once)
#     -> threads are stalling on the shared memory system -> per-core
#     throughput falls with concurrency -> the box is convicted and
#     the growth disappears on a cluster whose nodes add memory
#     systems with cores.
#
# Fresh JVM per run (the r8 bimodality discipline); min-of-reps taken
# by tools/thread_ab_report.py. Direct `java` (not sbt) so the A/B can
# run concurrently with foreground sbt work — flags mirror build.sbt.
#
# Usage: tools/thread_ab.sh <outdir> <reps> <query> [query...]
#   SPARK_GRAFT_AB_DIR   corpus dir (default target/scalecurve/sf30)
#   SPARK_GRAFT_AB_CPUS  thread counts (default "32 16 8 4") — e.g.
#                        "32 16" for the sf100 exponent-vs-threads run
set -u
OUT=$1; REPS=$2; shift 2
DIR=${SPARK_GRAFT_AB_DIR:-/root/repo/target/scalecurve/sf30}
CPUS=${SPARK_GRAFT_AB_CPUS:-"32 16 8 4"}
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for P in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for P in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
PIN="spark.sql.shuffle.partitions=32,spark.default.parallelism=32"
PIN="$PIN,spark.sql.adaptive.coalescePartitions.parallelismFirst=false"
mkdir -p "$OUT"
for Q in "$@"; do
  for C in $CPUS; do
    for R in $(seq 1 "$REPS"); do
      LOG="$OUT/${Q}_c${C}_r${R}.log"
      SPARK_GRAFT_CPUS=$C SPARK_GRAFT_CONF="$PIN" \
        java $OPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" \
          -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
          -cp "$CP" graft.QueryProfile "$Q" "$DIR" > "$LOG" 2>&1
      grep -a PROFILE_JSON "$LOG" | tail -1
    done
  done
done
