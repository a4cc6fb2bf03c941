#!/usr/bin/env bash
# Bench stdout-contract wrapper (VERDICT r9 ask #8): the driver parses
# the LAST stdout line as the compact totals object
# {"metric":"total","value":…,"med":…,"n":…,"errors":…} — a contract
# that took nine rounds to land (BENCH_r09.json was the first round
# with a non-null `parsed`). This wrapper runs the bench and exits
# nonzero unless the final stdout line parses as exactly that object,
# so a future stdout reshuffle can't silently regress it.
#
# Usage: SPARK_GRAFT_SF_DIR=... tools/bench.sh  (defaults as Bench.scala)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="$(mktemp)"
trap 'rm -f "$OUT"' EXIT
sbt -batch "runMain graft.Bench" | tee "$OUT"
STATUS=${PIPESTATUS[0]}
if [ "$STATUS" -ne 0 ]; then
  echo "BENCHWRAP FAIL: sbt exited $STATUS" >&2
  exit "$STATUS"
fi
python3 - "$OUT" <<'EOF'
import json, sys
lines = [l.strip() for l in open(sys.argv[1]) if l.strip()]
last = lines[-1] if lines else ""
try:
    obj = json.loads(last)
except Exception as e:
    sys.exit(f"BENCHWRAP FAIL: last stdout line is not JSON: {last[:200]!r} ({e})")
missing = [k for k in ("metric", "value", "n", "errors") if k not in obj]
if obj.get("metric") != "total" or missing:
    sys.exit(f"BENCHWRAP FAIL: last line is not the totals object "
             f"(metric={obj.get('metric')!r}, missing={missing}): {last[:200]!r}")
print(f"BENCHWRAP OK: totals line parsed (value={obj['value']}, n={obj['n']}, errors={obj['errors']})")
EOF
