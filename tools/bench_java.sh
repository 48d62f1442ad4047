#!/bin/bash
# Run graft.Bench via plain `java -cp` instead of sbt: the long sf1/sf10
# rehearsal benches otherwise hold the sbt build lock for hours, blocking
# all concurrent compile/test work, and sbt's stdout buffering hides
# per-row progress. Requires a prior `sbt compile` (classes are read from
# target/scala-2.13/classes). Spark jars come from /opt/spark/jars, same
# as build.sbt's unmanagedBase.
#
# Usage: tools/bench_java.sh <sfDir> <out.json> <reps> <Xmx> [onlyCsv]
#   onlyCsv: absent = full row set; non-empty = comma-separated filter
#   (matches the rehearse_sf10.sh contract via SPARK_GRAFT_BENCH_ONLY).
# Raw stdout+stderr tee to <out.json>.progress for live monitoring.
set -euo pipefail
cd /root/repo

dir="$1"; out="$2"; reps="$3"; mem="$4"; only="${5-}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_REPS="$reps" \
SPARK_GRAFT_BENCH_ONLY="$only" \
java $ADD_OPENS -Xmx"$mem" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>&1 | tee "$out.progress" | grep '^{"metric"' > "$out"
echo "== wrote $out"
