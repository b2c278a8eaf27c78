#!/bin/bash
# Scale-SF oracle sweep protocol (round-12/13 lesson, BASELINE.md):
# DuckDB's con.interrupt() does NOT break a spilling hash join, so a
# quadratic oracle at sf1+ wedges the in-process --timeout forever.
# The only reliable kill is a PROCESS-LEVEL timeout around each
# per-query selfcheck. Timeouts print as exclusions (own counter,
# never silent passes) — see tools/selfcheck.py.
#
# Usage: tools/scale_sweep.sh <sfdir> <outdir> [per-oracle-secs]
set -u
SFDIR=$1; OUTDIR=$2; BUDGET=${3:-420}
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SFDIR $OUTDIR" || exit 1
python3 - "$OUTDIR" <<'PY' > /tmp/_sweep_names.txt
import json, sys
print("\n".join(sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))))
PY
pass=0; fail=0; excl=0
while read -r q; do
  out=$(timeout $((BUDGET + 180)) python3 tools/selfcheck.py \
    "$SFDIR" "$OUTDIR" --skip-verify --timeout="$BUDGET" "$q" 2>&1)
  line=$(echo "$out" | grep -E "^(PASS|FAIL|TIMEOUT)" | head -1)
  case "$line" in
    PASS*) pass=$((pass+1));;
    TIMEOUT*) excl=$((excl+1)); echo "$line";;
    *) fail=$((fail+1)); echo "${line:-PROCKILL $q}";;
  esac
done < /tmp/_sweep_names.txt
echo "== scale sweep: $pass pass, $fail fail, $excl timeout-excluded =="
