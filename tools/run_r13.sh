#!/bin/bash
# Round-13 maintenance-shape smokes: run_r13.sh <nDocs> <heap> <case> [nVecs]
# case = mhcompact | ivfcompact (empty = both in one JVM — only safe at
# <= 10M docs / <= 2M vectors).
cd /root/repo
N=${1:-1000000}
V=${4:-2000000}
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SCALE_ONLY_R13=1 SCALE_R13_CASE=${3:-} java -Xmx${2:-48g} $OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSmoke $N $V 2>&1 | grep -E "scale|files|checksums|occupancy|probe rows|Exception|assertion"
echo "EXIT: ${PIPESTATUS[0]}"
