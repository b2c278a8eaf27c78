#!/bin/bash
# Close-of-round oracle sweep for ONE scale factor: a Verify run
# followed by the full DuckDB replay, split across two NON-OVERLAPPING
# lanes (forward + reverse over the sorted name list; each lane stops
# the moment it sees the other lane has already scored the name it is
# about to run). Halves sweep wall-clock without double-scoring.
#
# Same process-level-timeout lesson as tools/scale_sweep.sh: DuckDB's
# con.interrupt() cannot break a spilling hash join, so every per-query
# selfcheck gets its own `timeout` wrapper and a kill prints as its own
# result class (PROCKILL), never a silent pass.
#
# Usage: tools/close_sweep.sh <sf> [cpus] [heap]
#   e.g. tools/close_sweep.sh 0.01 8 16g
set -u
sf=$1; cpus=${2:-32}; mem=${3:-64g}
cd "$(dirname "$0")/.."
OUT=/tmp/v_close_$sf
SPARK_GRAFT_CPUS=$cpus java -Xmx$mem -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/testdata/sf$sf "$OUT" > /tmp/v_close_$sf.log 2>&1 \
  || { echo "VERIFY FAILED sf$sf"; exit 1; }
python3 - "$OUT" <<'PY' > /tmp/_close_names_$sf.txt
import json, sys
print("\n".join(sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))))
PY
rm -f /tmp/close_${sf}_f.log /tmp/close_${sf}_r.log
rm -rf /tmp/_close_claim_$sf && mkdir -p /tmp/_close_claim_$sf
run_lane() { # $1 = names file, $2 = own log, $3 = other lane's log
  while read -r q; do
    grep -q " ($q)\$" "$3" 2>/dev/null && break
    # Atomic per-query claim (round-15 advice): check-then-run races
    # at the lanes' meeting point — both lanes could start the same
    # query and duplicate up to ~10 min of work. mkdir is the atomic
    # test-and-set; the loser skips instead of re-running.
    mkdir "/tmp/_close_claim_$sf/$q" 2>/dev/null || continue
    out=$(timeout 600 python3 tools/selfcheck.py /root/testdata/sf$sf \
      "$OUT" --skip-verify --timeout=420 "$q" 2>&1)
    line=$(echo "$out" | grep -E "^(PASS|FAIL|TIMEOUT)" | head -1)
    # Distinct result classes (round-15 advice): empty output = the
    # process-level timeout killed the run (PROCKILL); non-empty
    # output with no known prefix = a script/Python error (ERROR) —
    # conflating the two hid tracebacks as timeout kills.
    if [ -z "$line" ] && [ -n "$out" ]; then line="ERROR $q"; fi
    echo "${line:-PROCKILL $q} ($q)" >> "$2"
  done < "$1"
}
tac /tmp/_close_names_$sf.txt > /tmp/_close_names_rev_$sf.txt
run_lane /tmp/_close_names_$sf.txt /tmp/close_${sf}_f.log /tmp/close_${sf}_r.log &
F=$!
run_lane /tmp/_close_names_rev_$sf.txt /tmp/close_${sf}_r.log /tmp/close_${sf}_f.log &
R=$!
wait $F $R
python3 - "$sf" <<'PY'
import re, sys
sf = sys.argv[1]
names = set(l.strip() for l in open(f'/tmp/_close_names_{sf}.txt') if l.strip())
res = {}
for lane in (f'/tmp/close_{sf}_f.log', f'/tmp/close_{sf}_r.log'):
    try:
        for line in open(lane):
            m = re.match(r'(PASS|FAIL|TIMEOUT|PROCKILL|ERROR)\b.* \((\S+)\)$', line.strip())
            if m: res.setdefault(m.group(2), m.group(1))
    except FileNotFoundError: pass
npass = sum(1 for v in res.values() if v == 'PASS')
bad = {k: v for k, v in res.items() if v != 'PASS'}
missing = names - set(res)
print(f"== close sweep sf{sf}: {npass} pass, bad={bad}, missing={sorted(missing)} ==")
PY
