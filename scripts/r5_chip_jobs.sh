#!/bin/bash
# Round-5 chip queue (run in background; restartable).  Probes the
# axon tunnel (CLAUDE.md #11) and runs queued jobs in priority order:
#   1. bench --warm-only: compile every bench shape into .cache/jax so
#      the driver's round-end bench never cold-compiles (VERDICT r4
#      weak #4: one stale 2^14 NTT entry cost 557 s of driver time).
#   2. prove_scale 22: the single-chip 2^22 e2e prove (VERDICT r4 task
#      5) — the previous attempt died when the VM restarted mid-job.
#   3. bench: refresh the saved bench JSON the driver replays when the
#      tunnel is down at round end.
# Jobs are marked done only on success; a timeout-kill wipes the
# compile cache (truncated entries segfault later readers, CLAUDE.md
# #6).  MAX_FAILS drops deterministic crashers.
cd "$(dirname "$0")/.." || exit 1
LOG=bench_results/watch_log.txt
LOCK=bench_results/.job_lock
MAX_FAILS=3
DEADLINE=${1:-$(( $(date +%s) + 12600 ))}
mkdir -p bench_results
echo "[$(date +%T)] r5 watcher start (pid $$, deadline $(date -d @"$DEADLINE" +%T))" >> "$LOG"

if [ -f "$LOCK" ]; then
  prev=$(cat "$LOCK" 2>/dev/null)
  while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do
    echo "[$(date +%T)] waiting for in-flight job pid $prev" >> "$LOG"
    sleep 15
  done
  rm -f "$LOCK"
fi

probe() {
  [ "$(curl -s --max-time 5 -o /dev/null -w '%{http_code}' \
      http://127.0.0.1:8113/)" != "000" ]
}

run_job() {
  local name=$1 tmo=$2; shift 2
  local marker="bench_results/.done_$name"
  local failf="bench_results/.fail_$name"
  [ -f "$marker" ] && return 0
  local fails=0
  [ -f "$failf" ] && fails=$(cat "$failf")
  if [ "$fails" -ge "$MAX_FAILS" ]; then
    return 0
  fi
  if [ $(( $(date +%s) + tmo )) -gt "$DEADLINE" ]; then
    echo "[$(date +%T)] skip $name (would cross deadline)" >> "$LOG"
    return 1
  fi
  probe || return 1
  echo "[$(date +%T)] start $name: $*" >> "$LOG"
  timeout --signal=KILL "$tmo" "$@" >> "bench_results/${name}.log" 2>&1 &
  echo $! > "$LOCK"
  wait $!
  local rc=$?
  rm -f "$LOCK"
  if [ $rc -eq 0 ]; then
    touch "$marker"
    rm -f "$failf"
    echo "[$(date +%T)] done $name" >> "$LOG"
  else
    echo $(( fails + 1 )) > "$failf"
    echo "[$(date +%T)] FAIL $name rc=$rc (attempt $(( fails + 1 ))/$MAX_FAILS)" >> "$LOG"
    if [ $rc -ge 124 ]; then
      echo "[$(date +%T)] wiping .cache/jax after kill (CLAUDE.md #6)" >> "$LOG"
      rm -rf .cache/jax
    fi
    sleep $(( 60 * (fails + 1) ))
    return 1
  fi
}

settled() {
  [ -f "bench_results/.done_$1" ] && return 0
  [ -f "bench_results/.fail_$1" ] && \
    [ "$(cat "bench_results/.fail_$1")" -ge "$MAX_FAILS" ]
}

while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[$(date +%T)] deadline reached; watcher exiting" >> "$LOG"
    rm -f "$LOCK"
    exit 0
  fi
  if probe; then
    run_job r5_warm_bench 4500 python bench.py --warm-only
    run_job r5_prove22 10800 python scripts/prove_scale.py 22 --tag=r5
    run_job r5_bench 3000 python bench.py
    if settled r5_warm_bench && settled r5_prove22 && settled r5_bench; then
      echo "[$(date +%T)] r5 queue drained; watcher exiting" >> "$LOG"
      exit 0
    fi
  fi
  sleep 20
done
