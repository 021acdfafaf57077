#!/bin/sh
# Round-4 chip queue #6 (after queue 5): G1 walk-kernel TILE/CB sweep
# on the batched devcsr commit at 2^18 (scratch/r4_tile_probe.py).
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs6 $(date +%H:%M:%S)] $*"; }

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

while ! grep -q "queue 5 complete" bench_results/r4_jobs5_driver.log 2>/dev/null; do
    sleep 180
done

JOB_TIMEOUT=3600
for combo in "256 16" "256 32" "512 16" "512 32" "1024 16"; do
    tile=${combo% *}; cb=${combo#* }
    run_job "r4_tile_${tile}_${cb}" env TPU_PLONK_G1_TILE=$tile \
        TPU_PLONK_MSM_CB=$cb python scratch/r4_tile_probe.py
done
log "queue 6 complete"
