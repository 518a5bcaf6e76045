#!/bin/bash
# Pipelined sf10 sweep: compare completed Verify outputs in waves while
# the Spark dump is still running. HEAVY-tier oracles (sweep10.py's
# list) are excluded — they run solo at the end with SWEEP_MEMLIMIT
# sized for the whole host, after the dump JVM has exited (two 60+ GB
# memory hogs at once exhausted the disk in r14).
# Usage: tools/sweepwaves.sh <sfdir> <outdir> <ledger> <dump_pid>
set -u
SFDIR=$1; OUTDIR=$2; LEDGER=$3; DUMP_PID=$4
HEAVY=$(python3 - <<'EOF'
import sys; sys.path.insert(0, "tools"); import sweep10
print("\n".join(sweep10.HEAVY))
EOF
)
while true; do
  RUNNING=0; kill -0 "$DUMP_PID" 2>/dev/null && RUNNING=1
  # completed = all output dirs except the 2 newest (possibly mid-write)
  # while the dump runs; everything once it has exited
  if [ "$RUNNING" = 1 ]; then
    COMPLETED=$(ls -t "$OUTDIR" | grep -v oracle_sql | tail -n +3)
  else
    COMPLETED=$(ls "$OUTDIR" | grep -v oracle_sql)
  fi
  # while the dump runs, also defer names that already failed/erred in
  # it (e.g. a spill racing the dump for disk) — the post-dump pass
  # retries them with the machine to itself (resume skips only "pass")
  DONE=$(python3 - "$LEDGER" "$RUNNING" <<'EOF'
import json, sys, os
p, running = sys.argv[1], sys.argv[2] == "1"
seen = {}
if os.path.exists(p):
    for line in open(p):
        r = json.loads(line)
        seen[r["name"]] = r["status"]
print("\n".join(n for n, s in seen.items() if s == "pass" or running))
EOF
)
  TODO=$(comm -23 <(echo "$COMPLETED" | sort) <(printf '%s\n%s\n' "$DONE" "$HEAVY" | sort -u))
  if [ -n "$TODO" ]; then
    python3 tools/sweep10.py "$SFDIR" "$OUTDIR" "$LEDGER" "$(echo "$TODO" | paste -sd,)"
  fi
  if [ "$RUNNING" = 0 ]; then
    echo "[sweepwaves] dump exited; non-heavy waves complete"
    break
  fi
  sleep 150
done
