#!/bin/bash
# Run a graft.tools.* probe main directly with java.
#
# Why not `sbt "runMain graft.tools.X"`: sbt's background-job runner
# executes forked runs from the PACKAGED jar (target/bg-jobs/...), and
# build.sbt deliberately filters graft/tools/** out of that jar (probes
# are measurement harnesses, not engine code) — so probe mains throw
# ClassNotFoundException under sbt while graft.Bench/graft.Verify work.
# This script runs the compiled classes directory instead, with the
# same JDK-17 add-opens and session flags build.sbt gives forked runs.
#
# Usage: tools/run_probe.sh graft.tools.PqSweepProbe [args...]
#        (compile first: sbt -batch compile)
set -eu
cd "$(dirname "$0")/.."
CLASS=${1:?usage: run_probe.sh <mainClass> [args...]}
shift || true
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# scala-library lookup: artifactory-mirror layout first, then the
# standard repo1.maven.org coursier layout (r20 ADVICE — the hardcoded
# mirror glob missed on a stock cache and the probe died at runtime
# with NoClassDefFoundError instead of a clear message)
SCALA_LIB=$(ls "$HOME"/.cache/coursier/v1/https/*/artifactory/maven-all/org/scala-lang/scala-library/2.13.*/scala-library-2.13.*.jar \
  "$HOME"/.cache/coursier/v1/https/repo1.maven.org/maven2/org/scala-lang/scala-library/2.13.*/scala-library-2.13.*.jar \
  /opt/spark/jars/scala-library-2.13.*.jar 2>/dev/null | sort | tail -1 || true)
if [ -z "$SCALA_LIB" ]; then
  echo "run_probe.sh: no scala-library 2.13 jar found (coursier cache or /opt/spark/jars)" >&2
  exit 3
fi
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:${SCALA_LIB:+$SCALA_LIB:}/opt/spark/jars/*" \
  "$CLASS" "$@"
