#!/usr/bin/env bash
# Streaming performance gate (VERDICT r8 ask #5): runs every stateful
# streaming mirror over the real events stream at 1x (sf0.1) and 10x
# (target/sf1, generated if missing), measuring rows/s and state-store
# rows. Fails when any mirror's state-per-key grows >1.5x at 10x input
# (the numeric form of the O(1)-per-key claims). Writes STREAMCHECK.json.
set -euo pipefail
cd "$(dirname "$0")/.."
BASE_DIR="${BASE_DIR:-/root/testdata/sf0.1}"
SF1_DIR="${SF1_DIR:-target/sf1}"
if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "generating $SF1_DIR from $BASE_DIR (10 shifted replicas)..."
  SF1_DIR="$SF1_DIR" python3 tools/make_sf1.py
fi
exec sbt -batch "runMain graft.StreamCheck $BASE_DIR $SF1_DIR"
