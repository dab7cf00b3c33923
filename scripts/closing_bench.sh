#!/usr/bin/env bash
# Closing-bench isolation protocol (BASELINE.md): package a jar, kill the
# sbt server (its JVM + compile daemons contend with the bench), run
# graft.Bench in a bare JVM against sf0.1, leave bench_out.json in the
# repo root. Run from /root/repo on an otherwise idle box.
#
# Usage: scripts/closing_bench.sh [sfDir] [tier]
#   (defaults /root/testdata/sf0.1 full;
#    tiers: full|quick|skip1m|no10m|only1m|only10mpipe|10m|10membed|all)
# Round-16 protocol: the driver's official capture is tier `full` (no 10M
# entries, fits the wall budget); the closing protocol ALSO runs tier `10m`
# separately and commits it as bench_out_10m.json.
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="${1:-/root/testdata/sf0.1}"
TIER="${2:-full}"

sbt -batch package

# kill sbt server/daemons by PID (pkill -f pattern would match this shell)
for pat in sbt-launch sbtn; do
  for pid in $(pgrep -f "$pat" || true); do
    [ "$pid" != "$$" ] && kill -9 "$pid" 2>/dev/null || true
  done
done
sleep 2

JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests' | head -1)
# JDK17 module opens (what spark-submit / the sbt fork inject): a bare JVM
# without them crashes any path that serializes under storage-memory
# pressure (Kryo + java.nio needs them) — first hit by the broadcast-verify
# LSH at small heaps, latent everywhere else.
ADDOPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADDOPENS -Xmx96g -cp "$JAR:/opt/spark/jars/*" graft.Bench "$SFDIR" "$TIER"
