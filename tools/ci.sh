#!/usr/bin/env bash
# Full local gate: tests → Verify@sf0.01 → DuckDB differential → Bench@sf0.1
set -euo pipefail
cd "$(dirname "$0")/.."
echo "=== sbt test"
sbt -batch test 2>&1 | tail -3
OUT=$(mktemp -d)
echo "=== Verify sf0.01 -> $OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" 2>&1 \
  | grep -E "\[verify\].*failed" || true
echo "=== DuckDB differential"
python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT"
echo "=== Bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"'
echo "=== CI green"
