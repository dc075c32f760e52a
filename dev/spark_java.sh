#!/usr/bin/env bash
# Run a compiled graft main directly on the Spark jars, BYPASSING the
# sbt project lock (one sbt command at a time; this lets a long soak
# run while sbt keeps compiling/testing). Round-13/14 idiom.
#
#   SPARK_GRAFT_CPUS=28 dev/spark_java.sh -Xmx32g graft.Verify /tmp/sf10 /tmp/out q33_ngram_jaccard
#   dev/spark_java.sh graft.devtools.SoakKnn /tmp/sf10 1024000000 256
#
# CAUTION: do NOT `sbt compile` while one of these JVMs is running —
# it reads classfiles from target/scala-2.13/classes lazily.
set -euo pipefail
cd "$(dirname "$0")/.."
XMX=()
if [[ "${1:-}" == -Xmx* ]]; then XMX=("$1"); shift; fi
exec java "${XMX[@]}" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
