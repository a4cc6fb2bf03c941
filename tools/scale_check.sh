#!/usr/bin/env bash
# One-command sf1 scale-regression gate (VERDICT r4 ask #8):
# generates the 10x stress data if missing, then runs graft.ScaleCheck
# over EVERY SparkEntry query at sf0.1 vs sf1 and exits nonzero when the
# median big/base wall-clock ratio breaches the contract (default 10x —
# at-most-linear in the median for 10x data).
#
#   tools/scale_check.sh [bound]
set -euo pipefail
cd "$(dirname "$0")/.."
BOUND="${1:-10}"
BASE_DIR="${BASE_DIR:-/root/testdata/sf0.1}"
SF1_DIR="${SF1_DIR:-target/sf1}"
if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "generating $SF1_DIR from $BASE_DIR (10 shifted replicas)..."
  SF1_DIR="$SF1_DIR" python3 tools/make_sf1.py
fi
exec sbt -batch "runMain graft.ScaleCheck $BASE_DIR $SF1_DIR $BOUND"
