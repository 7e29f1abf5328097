#!/bin/bash
# HOST-INCIDENT fallback test runner (HOST_INCIDENT.md): runs the
# ScalaTest suite directly on the committed compiled classes — sbt
# cannot run post-incident. Test-only jars (scalatest/scalacheck) are
# discovered in the local coursier cache at runtime.
#   ./run_tests_direct.sh                 # whole suite
#   ./run_tests_direct.sh -s graft.ProbePlanSpec   # one suite
set -euo pipefail
cd "$(dirname "$0")"
# Staleness guard (ADVICE r10): refuse a green "suite replay" over classes
# that no longer match the source tree. compile_direct.sh stamps
# COMPILED_AT.{main,test} with a sha256 over src/; abort on mismatch.
for m in main test; do
  SRC_ROOT="src/main/scala"; [ "$m" = "test" ] && SRC_ROOT="src/test/scala"
  SRC_SHA=$(find "$SRC_ROOT" -name '*.scala' -print0 | sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1)
  STAMP="target/scala-2.13/COMPILED_AT.$m"
  if [ ! -f "$STAMP" ]; then
    echo "WARN: $STAMP missing — cannot verify classes match sources (pre-stamp build)." >&2
  elif ! grep -q "src_sha256=$SRC_SHA" "$STAMP"; then
    echo "ERROR: compiled $m classes are STALE relative to $SRC_ROOT (run ./compile_direct.sh $m)." >&2
    exit 2
  fi
done
CP="target/scala-2.13/classes:target/scala-2.13/test-classes"
# stock jars (the r10 lib-recovered substitution was retired after the
# r12 host rebuild — HOST_INCIDENT.md)
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done
for j in $(find "$HOME/.cache/coursier" \
    \( -name "scalatest*_2.13-3.2.19.jar" -o -name "scalatest*-3.2.19.jar" \
       -o -name "scalactic_2.13-3.2.19.jar" -o -name "scalacheck_2.13-1.18.0.jar" \
       -o -name "test-interface-*.jar" \) 2>/dev/null); do
  CP="$CP:$j"
done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
ARGS=("$@")
if [ ${#ARGS[@]} -eq 0 ]; then ARGS=(-R target/scala-2.13/test-classes); fi
# Suite-log preservation (VERDICT r11 #2): every run tees to a git-rev-stamped
# log and, for FULL-suite runs, emits SUITE_<rev>.json {suites,tests,failed}
# so a "suite green" claim always carries its artifact.
REV=$(git rev-parse --short HEAD 2>/dev/null || echo unknown)
# git status --porcelain, not diff --quiet: untracked source files also
# make the compiled binary differ from the rev (the staleness stamp
# hashes ALL .scala files, so untracked code replays as "fresh")
[ -z "$(git status --porcelain 2>/dev/null)" ] || REV="${REV}-dirty"
LOG="target/suite_${REV}_$(date -u +%Y%m%dT%H%M%SZ).log"
set +e
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" org.scalatest.tools.Runner \
  -oW "${ARGS[@]}" 2>&1 | tee "$LOG"
RC=${PIPESTATUS[0]}
set -e
echo "suite log: $LOG" >&2
if [ ${#ARGS[@]} -eq 2 ] && [ "${ARGS[0]}" = "-R" ]; then
  python3 - "$LOG" "$REV" "$RC" <<'EOF'
import json, re, sys, time
log, rev, rc = sys.argv[1], sys.argv[2], int(sys.argv[3])
text = open(log, errors="replace").read()
suites = re.search(r"Suites: completed (\d+)", text)
tests = re.search(r"Tests: succeeded (\d+), failed (\d+)", text)
out = {"git_rev": rev, "rc": rc, "log": log,
       "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
       "suites": int(suites.group(1)) if suites else None,
       "tests": int(tests.group(1)) if tests else None,
       "failed": int(tests.group(2)) if tests else None}
path = f"SUITE_{rev}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"WROTE {path}: {out}")
EOF
fi
exit "$RC"
