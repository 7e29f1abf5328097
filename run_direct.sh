#!/bin/bash
# Direct runner (originally the r10 host-incident fallback — see
# HOST_INCIDENT.md; the host was rebuilt in r12 and sbt works again,
# but this remains a useful zero-sbt way to run any graft main
# against the compiled classes + stock Spark jars).
#
#   ./run_direct.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#   SPARK_GRAFT_SF_DIR=... ./run_direct.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")"
CP="target/scala-2.13/classes"
# stock jars (the r10 lib-recovered substitution was retired after the
# r12 host rebuild — HOST_INCIDENT.md)
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
