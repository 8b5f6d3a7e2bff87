#!/bin/bash
# Dump formatted plans: tools/explain.sh <outDir> <sfDir> <suffix> <names|all>
cd /root/repo
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -XX:ReservedCodeCacheSize=1g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Explain dump "$@"
