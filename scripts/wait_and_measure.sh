#!/bin/bash
# Tunnel watcher: probe the axon TPU tunnel (CLAUDE.md #11) and, when it
# answers HTTP, run the queued on-chip measurement jobs in priority
# order.  Every job is re-runnable (the tunnel/worker can die mid-job —
# docs/ROADMAP.md landmines) and is marked done only on success, so the
# watcher can be restarted at any time.  A timeout-killed JAX job can
# leave a truncated entry in the persistent compile cache that segfaults
# later readers (CLAUDE.md #6), so the cache dir is wiped after any kill.
#
# While a job runs, bench_results/.job_lock holds its PID; bench.py
# checks it and replays the saved bench instead of contending for the
# single chip (two concurrent heavy JAX clients crash the tunnel
# worker).
#
# Usage: bash scripts/wait_and_measure.sh [deadline_epoch]
# (run in background; logs to bench_results/watch_log.txt, markers in
# bench_results/.done_*).  ADVICE r2: a job that fails MAX_FAILS times
# consecutively is dropped from the queue (no infinite retry of a
# deterministic crash), and the watcher exits unconditionally at the
# deadline (default: 3 h from start) so the chip is free and the lock
# released well before the driver's round-end bench (VERDICT r2 #2).

cd "$(dirname "$0")/.." || exit 1
LOG=bench_results/watch_log.txt
LOCK=bench_results/.job_lock
MAX_FAILS=3
DEADLINE=${1:-$(( $(date +%s) + 10800 ))}
mkdir -p bench_results
echo "[$(date +%T)] watcher start (pid $$, deadline $(date -d @"$DEADLINE" +%T))" >> "$LOG"

# A previous watcher's job may still be running (orphaned): wait it out.
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

# run_job NAME TIMEOUT_S CMD... — skip if done-marker exists; re-probe
# first; wipe the jax compile cache if the job was killed by timeout.
run_job() {
  local name=$1 tmo=$2; shift 2
  local marker="bench_results/.done_$name"
  local failf="bench_results/.fail_$name"
  [ -f "$marker" ] && return 0
  local fails=0
  [ -f "$failf" ] && fails=$(cat "$failf")
  if [ "$fails" -ge "$MAX_FAILS" ]; then
    return 0   # dropped: deterministic crasher, stop burning chip time
  fi
  # never start a job that can't finish before the deadline
  if [ $(( $(date +%s) + tmo )) -gt "$DEADLINE" ]; then
    echo "[$(date +%T)] skip $name (would cross deadline)" >> "$LOG"
    return 1
  fi
  probe || return 1
  echo "[$(date +%T)] start $name: $*" >> "$LOG"
  timeout --signal=KILL "$tmo" "$@" >> "$LOG" 2>&1 &
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
      echo "[$(date +%T)] wiping .cache/jax after kill (CLAUDE.md #6)" \
        >> "$LOG"
      rm -rf .cache/jax
    fi
    sleep $(( 60 * (fails + 1) ))   # backoff between retries
    return 1
  fi
}

while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[$(date +%T)] deadline reached; watcher exiting" >> "$LOG"
    rm -f "$LOCK"
    exit 0
  fi
  if probe; then
    # 1. Opt-in Pallas kernel probes (ROADMAP #1/#2: BUILT, awaiting
    #    measurement).  Tags mark provenance in the probe JSON rows.
    run_job msm18_fused 1500 env TPU_PLONK_MSM_FUSED=1 \
      python scripts/msm_sweep.py 18 --quick --tag=fused
    run_job ntt22_pallas 1200 env TPU_PLONK_NTT_PALLAS=1 \
      python scripts/ntt_probe.py 22 3 --tag=pallas
    run_job ntt22_plain 900 python scripts/ntt_probe.py 22 3 --tag=plain
    # 1b. Fused MSM (now the default) at the sizes flanking 2^18 —
    #     VERDICT wants throughput non-decreasing 2^16 -> 2^20.  A tag
    #     makes the sweep run exactly one (c=13, default-chunk) config.
    run_job msm16_fused 900 python scripts/msm_sweep.py 16 --tag=fused16
    run_job msm20_fused 1800 python scripts/msm_sweep.py 20 --tag=fused20
    # default chunk at 2^20 measured BELOW the 2^18 rate (319k vs
    # 353k): sweep (c, chunk) to find the right large-size defaults
    run_job msm20_sweep 2400 python scripts/msm_sweep.py 20 --quick
    # 2. Refresh the saved bench (driver replays it if the tunnel is
    #    down or the chip is busy at round end) BEFORE the long prove.
    run_job bench 2400 python bench.py
    # 3. The unmeasured BASELINE headline: e2e prove at 2^20 gates.
    run_job prove20 7200 python scripts/prove_scale.py 20
    # 4. Combined-flag prove at 2^18 (fast; compares vs the plain run).
    run_job prove18_flags 2400 env TPU_PLONK_FR_PALLAS=1 \
      TPU_PLONK_QUOT_PALLAS=1 TPU_PLONK_NTT_PALLAS=1 \
      python scripts/prove_scale.py 18 --tag=flags
    # All done?  (a job dropped after MAX_FAILS counts as terminal)
    settled() {
      [ -f "bench_results/.done_$1" ] && return 0
      [ -f "bench_results/.fail_$1" ] && \
        [ "$(cat "bench_results/.fail_$1")" -ge "$MAX_FAILS" ]
    }
    if settled bench && settled prove20 && settled prove18_flags; then
      echo "[$(date +%T)] queue drained; watcher exiting" >> "$LOG"
      exit 0
    fi
  fi
  sleep 20
done
