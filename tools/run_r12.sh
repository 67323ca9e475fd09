#!/bin/bash
# Round-12 production-shape smokes: run_r12.sh <nDocs> <heap> <case>
# case = mhindex | bm25index | pipe (empty = all three in one JVM — only
# safe at <= 10M docs; the 100M decade runs one case per JVM).
cd /root/repo
N=${1:-1000000}
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SCALE_ONLY_R12=1 SCALE_R12_CASE=${3:-} java -Xmx${2:-48g} $OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSmoke $N 2>&1 | grep -E "scale|status|checksums|result|shards|gate|stray|Exception|assertion"
# PIPESTATUS[0], not $?: $? is grep's exit, which hid an assert failure
# in the r11 incdedup log (EXIT: 0 under a thrown AssertionError).
echo "EXIT: ${PIPESTATUS[0]}"
