#!/bin/bash
# Isolated fresh-JVM-per-rep bench for named queries (the d16 triage
# discipline from ROUND10_NOTES applied to the full-bench path): each
# rep boots its own JVM, runs graft.Bench restricted to the named
# queries (min-of-3 in-JVM, shared table cache, same config as the
# canonical pass), and prints that JVM's per-query minima. Use to
# adjudicate single-query regression flags — in-suite minima for
# ~1-3 s queries swing +/-30% from accumulated session state while
# fresh-JVM minima are tight.
#
# Usage: tools/isolated_bench.sh <sf_dir> <reps> <query> [query...]
set -u
SF=$1; REPS=$2; shift 2
OPENS=""
for P in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for P in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for R in $(seq 1 "$REPS"); do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    java $OPENS -Xmx48g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" 2>/dev/null | grep '"queries"' | tail -1
done
