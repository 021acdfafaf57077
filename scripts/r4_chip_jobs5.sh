#!/bin/sh
# Round-4 chip queue #5 (runs after queue 4): BASELINE config-3 shape
# (2^18 gates with the Poseidon sponge gadget) + devcsr c-sweep at
# 2^18/2^20 for size-aware window selection.
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs5 $(date +%H:%M:%S)] $*"; }

probe() {
    code=$(curl -s --max-time 5 http://127.0.0.1:8113/ -o /dev/null -w "%{http_code}")
    [ "$code" != "000" ]
}

run_job() {
    name=$1; shift
    while [ -f bench_results/.job_lock ]; do sleep 30; done
    if ! probe; then log "tunnel down before $name; waiting"; fi
    while ! probe; do sleep 60; done
    log "start $name"
    timeout "$JOB_TIMEOUT" "$@" >> "bench_results/$name.log" 2>&1 &
    pid=$!
    echo "$pid" > bench_results/.job_lock
    wait "$pid"
    rc=$?
    rm -f bench_results/.job_lock
    log "done $name rc=$rc"
}

while ! grep -q "queue 4 complete" bench_results/r4_jobs4_driver.log 2>/dev/null; do
    sleep 180
done

JOB_TIMEOUT=10800
run_job r4_prove18_pos python scripts/prove_scale.py 18 --poseidon --tag=pos
JOB_TIMEOUT=7200
run_job r4_csweep python scratch/r4_csweep_probe.py
log "queue 5 complete"
