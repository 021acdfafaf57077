#!/bin/sh
# Round-4 chip measurement queue (run under scratch/wait_tunnel.sh).
# Each job is independently re-runnable; a tunnel death mid-job only
# loses that job.  Everything disk-caches (SRS, preprocess, compile
# cache) so re-runs converge fast.
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs $(date +%H:%M:%S)] $*"; }

probe() {
    code=$(curl -s --max-time 5 http://127.0.0.1:8113/ -o /dev/null -w "%{http_code}")
    [ "$code" != "000" ]
}

run_job() {
    name=$1; shift
    if ! probe; then log "tunnel down before $name; waiting"; fi
    while ! probe; do sleep 60; done
    log "start $name"
    timeout "$JOB_TIMEOUT" "$@" >> "bench_results/$name.log" 2>&1
    rc=$?
    log "done $name rc=$rc"
}

JOB_TIMEOUT=${JOB_TIMEOUT:-3600}
run_job r4_devcsr_probe18 python scripts/devcsr_probe.py 18
run_job r4_devcsr_probe20 python scripts/devcsr_probe.py 20
JOB_TIMEOUT=7200
run_job r4_devcsr_tiles python scripts/devcsr_probe.py 18 --tiles
JOB_TIMEOUT=7200
run_job r4_prove18 python scripts/prove_scale.py 18
JOB_TIMEOUT=10800
run_job r4_prove20 python scripts/prove_scale.py 20
JOB_TIMEOUT=3600
run_job r4_bench python bench.py
# experiments (tagged; env flags recorded in the result JSON):
# phase-static cache at scale — r3 disabled it >2^16 under host-CSR
# HBM pressure; devcsr freed that, so re-measure
JOB_TIMEOUT=7200
TPU_PLONK_CACHE_PHASES=1 run_job r4_prove18_cp \
    env TPU_PLONK_CACHE_PHASES=1 python scripts/prove_scale.py 18 --tag=cp
TPU_PLONK_CACHE_PHASES=1 run_job r4_prove20_cp \
    env TPU_PLONK_CACHE_PHASES=1 python scripts/prove_scale.py 20 --tag=cp
log "queue complete"
