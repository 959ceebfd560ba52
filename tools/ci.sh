#!/usr/bin/env bash
# Driver-shaped gate runner: compile -> test -> verify(sf0.01) ->
# DuckDB compare -> bench(sf0.1). Mirrors what the round driver does.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY=${SF_VERIFY:-/root/testdata/sf0.01}
SF_BENCH=${SF_BENCH:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/graft_ci_verify}

echo "== compile + test =="
sbt -batch compile test

echo "== verify @ $SF_VERIFY =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF_VERIFY $OUT"

echo "== DuckDB compare =="
python3 tools/compare_oracle.py "$SF_VERIFY" "$OUT"

echo "== bench @ $SF_BENCH =="
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" | grep '"metric"'

echo "== all gates green =="
