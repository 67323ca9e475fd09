#!/bin/bash
# Round-14 second-session tombstone-delete lifecycle smoke:
# run_r14b.sh <nDocs> <heap> [case: bm25|mh|ivf]. Builds the index(es), deletes a
# 1% takedown batch, probes before / after (anti-join) / after the
# compaction fold, and checks the frozen-stats invariants at scale.
cd /root/repo
N=${1:-1000000}
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SCALE_ONLY_R14B=1 SCALE_R14B_CASE=${3:-} java -Xmx${2:-48g} $OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSmoke $N 2>&1 | grep -E "scale|checksums|pre-delete|doomed|Exception|assertion"
echo "EXIT: ${PIPESTATUS[0]}"
