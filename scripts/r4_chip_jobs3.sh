#!/bin/sh
# Round-4 chip queue #3: refresh scale proves + bench with the
# MXU-REDC walk default and halved level-2 depths (commit a94c7c5).
# Writes bench_results/.job_lock while a job runs (bench.py contention
# protocol) so a driver bench waits instead of contending.
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs3 $(date +%H:%M:%S)] $*"; }

probe() {
    code=$(curl -s --max-time 5 http://127.0.0.1:8113/ -o /dev/null -w "%{http_code}")
    [ "$code" != "000" ]
}

run_job() {
    name=$1; shift
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

JOB_TIMEOUT=${JOB_TIMEOUT:-7200}
run_job r4_prove18_mxu python scripts/prove_scale.py 18
JOB_TIMEOUT=10800
run_job r4_prove20_mxu python scripts/prove_scale.py 20
JOB_TIMEOUT=5400
run_job r4_bench2 python bench.py
log "queue 3 complete"
