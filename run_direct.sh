#!/bin/bash
# HOST-INCIDENT fallback runner (HOST_INCIDENT.md): the host disk lost
# cold regions including JDK jimage pages that sbt's launcher needs —
# `sbt runMain` SIGBUS-crashes before reaching user code, while the
# Spark application itself loads fine. This runs any graft main
# directly against the already-compiled classes + the repaired
# classpath (lib-recovered/ substitutes the four dead stock jars).
#
#   ./run_direct.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#   SPARK_GRAFT_SF_DIR=... ./run_direct.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")"
CP="target/scala-2.13/classes"
for j in lib-recovered/*.jar; do CP="$CP:$j"; done
for j in /opt/spark/jars/*.jar; do
  case "$(basename "$j")" in
    spark-sql_2.13-4.1.2.jar|zstd-jni-1.5.7-6.jar|hadoop-client-api-3.4.2.jar|hive-metastore-2.3.10.jar) ;;
    *) CP="$CP:$j" ;;
  esac
done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
