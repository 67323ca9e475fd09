#!/bin/bash
# Round-14 WAND/semi-join gating sweep: run_r14.sh <nDocs> <heap> [case]
# case = common | rare (empty = both). Forces each pruning path on the
# same query batches against one prebuilt index and checks checksum
# equality; the defaults' gating log line states which path it chose.
cd /root/repo
N=${1:-1000000}
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SCALE_ONLY_R14=1 SCALE_R14_CASE=${3:-} java -Xmx${2:-48g} $OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSmoke $N 2>&1 | grep -E "scale|checksums|INFO Bm25|Exception|assertion"
echo "EXIT: ${PIPESTATUS[0]}"
