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
# SPARK_GRAFT_CPUS (default 4) matches the canonical pass's config —
# the committed per-query map is measured at cpus=4, and r11 pass A
# showed cpus=32 distorts sub-second queries by ~32 tasks of
# scheduling while flattering the heavy ones. Export CPUS=32 only
# when triaging a heavy query against other 32-cpu measurements.
set -u
SF=$1; REPS=$2; shift 2
CPUS=${SPARK_GRAFT_CPUS:-4}
OPENS=""
for P in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for P in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$P=ALL-UNNAMED"
done
for R in $(seq 1 "$REPS"); do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=$CPUS \
    java $OPENS -Xmx48g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" 2>/dev/null | grep '"queries"' | tail -1
done
