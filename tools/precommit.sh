#!/usr/bin/env bash
# Pre-commit gate: no snapshot ships without a green compile and a
# three-query oracle smoke. Round 8 zeroed its artifacts by committing
# a non-compiling tree — this script makes that impossible to repeat.
#
# Usage: tools/precommit.sh [query,names]   (default smoke: q01,d36,ds10)
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE="${1:-q01_pricing_summary,d36_temperature_mix,ds10_band_panel}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT=/tmp/precommit_verify

echo "[precommit] sbt compile + Test/compile..."
sbt -batch compile Test/compile

echo "[precommit] smoke verify: $SMOKE @ $SF"
rm -rf "$OUT"
CP="$(ls -d /opt/spark/jars/* | tr '\n' ':')target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx8g \
  graft.Verify "$SF" "$OUT" "$SMOKE"

python3 tools/check.py "$SF" "$OUT" ${SMOKE//,/ }
echo "[precommit] OK — safe to commit"
