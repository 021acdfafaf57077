#!/bin/sh
# Round-4 chip queue #4: measure the batched-commit engine
# (commit 77bc784: _commit_sums_many groups, lincomb_many, batched z
# phase NTTs, cache_phases at 2^18) and probe the 2^20 phase cache.
# Waits for any running probe's .job_lock first.
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs4 $(date +%H:%M:%S)] $*"; }

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

JOB_TIMEOUT=${JOB_TIMEOUT:-7200}
run_job r4_prove18_batched python scripts/prove_scale.py 18
JOB_TIMEOUT=10800
run_job r4_prove20_batched python scripts/prove_scale.py 20
# 2^20 with the full phase cache + prefetch (opt-in probe: ~4 GB static
# tables + 1.3 GB prefetch on the 16 GB chip)
JOB_TIMEOUT=10800
TPU_PLONK_CACHE_PHASES=1 run_job r4_prove20_cachep \
    env TPU_PLONK_CACHE_PHASES=1 python scripts/prove_scale.py 20 --tag=cachep
JOB_TIMEOUT=5400
run_job r4_bench3 python bench.py
log "queue 4 complete"
