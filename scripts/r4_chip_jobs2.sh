#!/bin/sh
# Round-4 chip queue #2: kernel-variant + window-width measurements.
#   - TPU_PLONK_PL_MXU / TPU_PLONK_PL_MUL16: the in-kernel multiply
#     variants (fields/pallas_redc.py) built in round 2, never measured
#     on the chip with the fused walk.
#   - large c at 2^20: the round-3 sweep found c=14 catastrophic, but
#     that predates the top-window level-2 split (csr_device.top_b);
#     with the skew handled, fewer windows = fewer point adds.
#   - 2^16 devcsr datapoint for the r3 small-size regression.
# Usage: sh scripts/r4_chip_jobs2.sh [pid_to_wait_for]
# Writes bench_results/.job_lock (the bench.py contention protocol) so
# a driver bench waits instead of contending for the single chip.
cd "$(dirname "$0")/.." || exit 1
log() { echo "[r4jobs2 $(date +%H:%M:%S)] $*"; }

if [ -n "$1" ]; then
    log "waiting for queue 1 (pid $1) to finish"
    while kill -0 "$1" 2>/dev/null; do sleep 60; done
    log "queue 1 done"
fi

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

JOB_TIMEOUT=${JOB_TIMEOUT:-3600}
run_job r4_devcsr_mxu env TPU_PLONK_PL_MXU=1 \
    python scripts/devcsr_probe.py 18 --tag=mxu
run_job r4_devcsr_mul16 env TPU_PLONK_PL_MUL16=1 \
    python scripts/devcsr_probe.py 18 --tag=mul16
run_job r4_devcsr_c14_20 python scripts/devcsr_probe.py 20 --c=14
run_job r4_devcsr_c15_20 python scripts/devcsr_probe.py 20 --c=15
run_job r4_devcsr_c16_20 python scripts/devcsr_probe.py 20 --c=16
run_job r4_devcsr_probe16 python scripts/devcsr_probe.py 16
log "queue 2 complete"
