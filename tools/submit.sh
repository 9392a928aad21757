#!/usr/bin/env bash
# spark-submit --py-files packaging (north_rule launch mode).
#
#   tools/submit.sh <entry.py> [spark-submit args...] -- [app args...]
#
# Zips the stac_populator_spark package and submits any entry point
# (bench.py, __spark_entry__.py, or a user job) against local[N] here /
# a real master via --master on a cluster.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ENTRY="${1:?usage: submit.sh <entry.py> [spark-submit args...]}"
shift || true

ZIP="$(mktemp -d)/stac_populator_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" stac_populator_spark -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$@" "$REPO/$ENTRY"
