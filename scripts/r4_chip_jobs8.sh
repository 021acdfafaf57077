#!/bin/sh
# Round-4 chip queue #8 (after queue 6): 2^20 prove with the decoupled
# prefetch (b5e035a u16 pushes + prefetch-no-cache branch).
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs8 $(date +%H:%M:%S)] $*"; }
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
while ! grep -q "queue 7 complete" bench_results/r4_jobs7_driver.log 2>/dev/null; do
    sleep 180
done
JOB_TIMEOUT=10800
run_job r4_prove18_blind python scripts/prove_scale.py 18 --blind --tag=blind
log "queue 8 complete"
