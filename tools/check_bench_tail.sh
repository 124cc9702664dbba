#!/usr/bin/env bash
# Adversarial self-test for the bench stdout tail contract (r17 ask #5).
#
# BENCH_r17.json was rc 124 / parsed:null because log4j WARN spam (stderr,
# merged 2>&1 by the driver) displaced the final JSON line out of the 2KB
# tail window. This script reproduces that hostile condition on purpose —
# SPARK_GRAFT_BENCH_FORCE_NOISE=1 runs a thread spamming the exact
# WindowExec WARN through log4j AND raw stderr for the whole suite — and
# asserts that the LAST 2000 characters of merged output still parse as
# the bench JSON line.
#
# Usage: tools/check_bench_tail.sh [query_subset]   (default: q01_time_attrs)
set -u
cd "$(dirname "$0")/.."
SUBSET="${1:-q01_time_attrs}"
OUT=$(mktemp /tmp/bench_tail_check.XXXXXX)
SPARK_GRAFT_BENCH_FORCE_NOISE=1 \
SPARK_GRAFT_BENCH_ONLY="$SUBSET" \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  sbt -batch "runMain graft.Bench" >"$OUT" 2>&1
RC=$?
python3 - "$OUT" <<'EOF'
import json, re, sys
tail = open(sys.argv[1], errors="replace").read()[-2000:]
# the driver strips nothing: it greps the tail for a parseable JSON object
# line — emulate that: last line that starts with '{' after an optional
# sbt "[info] " prefix and parses
parsed = None
for line in tail.splitlines():
    m = re.match(r"^(?:\[info\] )?(\{.*\})\s*$", line)
    if m:
        try:
            parsed = json.loads(m.group(1))
        except ValueError:
            pass
if parsed is None or parsed.get("metric") != "total":
    print("TAIL-CHECK FAIL: no parseable bench JSON in final 2000 chars")
    print("--- tail ---")
    print(tail)
    sys.exit(1)
noise = tail.count("forced-noise") + tail.count("No Partition Defined")
print(f"TAIL-CHECK PASS: parsed total={parsed['value']}s "
      f"wall={parsed.get('wall_sec')}s degraded={parsed.get('degraded')} "
      f"(noise lines still in tail: {noise})")
EOF
PY=$?
rm -f "$OUT"
[ $RC -eq 0 ] && [ $PY -eq 0 ]
