#!/bin/bash
# Clean-JVM bench runner (the playbook recipe, persisted): plain java on
# the compiled classes — NEVER run with another sbt/JVM alive, a
# contaminated run reads ~+30%. Usage:
#   sbt -batch compile          # make sure classes are current, then
#   scripts/bench.sh [sf_dir]   # default /root/testdata/sf0.1
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec env SPARK_GRAFT_SF_DIR="$SF_DIR" java -cp "$CP" -Xmx100g \
  $OPENS \
  -Dspark.ui.enabled=false \
  graft.Bench
