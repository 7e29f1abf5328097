#!/bin/bash
# HOST-INCIDENT fallback compiler (HOST_INCIDENT.md): sbt's launcher
# SIGBUS-crashes on the rotten JDK jimage regions, but scalac itself is
# just a jar on the (readable) Spark classpath — invoke it directly.
#
#   ./compile_direct.sh            # compile main sources -> target/scala-2.13/classes
#   ./compile_direct.sh test       # compile test sources -> target/scala-2.13/test-classes
#
# This is a FULL clean recompile of the requested tree (no zinc
# incrementality). After a successful run it refreshes COMPILED_AT so
# run_tests_direct.sh can verify classes match sources (ADVICE r10 #2).
set -euo pipefail
cd "$(dirname "$0")"

SCALAC_CP=""
for j in /opt/spark/jars/scala-compiler-2.13.17.jar \
         /opt/spark/jars/scala-library-2.13.17.jar \
         /opt/spark/jars/scala-reflect-2.13.17.jar; do
  SCALAC_CP="$SCALAC_CP:$j"
done
SCALAC_CP="${SCALAC_CP#:}"

# app classpath = repaired jars + stock spark jars minus the four dead ones
CP="target/scala-2.13/classes"
# stock jars (the r10 lib-recovered substitution was retired after the
# r12 host rebuild — HOST_INCIDENT.md)
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done

MODE="${1:-main}"
if [ "$MODE" = "test" ]; then
  for j in $(find "$HOME/.cache/coursier" \
      \( -name "scalatest*_2.13-3.2.19.jar" -o -name "scalatest*-3.2.19.jar" \
         -o -name "scalactic_2.13-3.2.19.jar" -o -name "scalacheck_2.13-1.18.0.jar" \
         -o -name "test-interface-*.jar" \) 2>/dev/null); do
    CP="$CP:$j"
  done
  OUT="target/scala-2.13/test-classes"
  SRCS=$(find src/test/scala -name "*.scala")
else
  OUT="target/scala-2.13/classes"
  SRCS=$(find src/main/scala -name "*.scala")
fi

mkdir -p "$OUT"
java -Xmx4g -cp "$SCALAC_CP" scala.tools.nsc.Main \
  -classpath "$CP" -d "$OUT" \
  -deprecation -feature -release 17 \
  $SRCS
echo "compiled $MODE -> $OUT"

# staleness stamp: git rev + sha256 over the compiled subtree (sorted)
SRC_ROOT="src/main/scala"; [ "$MODE" = "test" ] && SRC_ROOT="src/test/scala"
{
  echo "git_rev=$(git rev-parse HEAD 2>/dev/null || echo unknown)"
  echo "src_sha256=$(find "$SRC_ROOT" -name '*.scala' -print0 | sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1)"
  echo "compiled_utc=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "mode=$MODE"
} > "target/scala-2.13/COMPILED_AT.${MODE}"
