"""Measure the (i)NTT at one size on the current backend and append a
JSON row to bench_results/ntt_probe.json.  Perf flags (e.g.
TPU_PLONK_NTT_PALLAS=1) are read by the library at trace time; this
script records them in the row for provenance.

Usage: python scripts/ntt_probe.py [log_n] [iters] [--tag=NAME]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    log_n = int(args[0]) if args else 22
    iters = int(args[1]) if len(args) > 1 else 3
    tag = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--tag=")), "")

    from tpu_plonk.poly import ntt as nttmod
    from tpu_plonk.params import R_MOD
    from tpu_plonk.fields import limbs
    from tpu_plonk.poly.domain import Domain

    n = 1 << log_n
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16),
                                 dtype=np.uint32))
    t0 = time.time()
    y = nttmod.ntt(x, log_n)
    np.asarray(y[:1])
    compile_s = time.time() - t0
    profile_dir = None
    if "--profile" in sys.argv:
        # capture a device trace of the steady iterations (view with
        # tensorboard --logdir <dir>); answers where the transform's
        # wall time actually goes on the real chip
        from tpu_plonk.utils import profiling
        profile_dir = os.path.join(
            os.path.dirname(__file__), os.pardir, ".cache",
            f"profile_ntt{log_n}_{tag or 'base'}")
        ctx = profiling.trace(profile_dir)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        t0 = time.time()
        for _ in range(iters):
            y = nttmod.ntt(y, log_n)
            np.asarray(y[:1])
        steady = (time.time() - t0) / iters

    # spot-check correctness against the host oracle on a small prefix
    # polynomial embedded in the same program path
    k = 1 << 8
    vals = [int(v) % R_MOD for v in rng.integers(0, 1 << 62, size=k)]
    xs = jnp.asarray(limbs.fr_to_limbs(
        [v * pow(2, 256, R_MOD) % R_MOD for v in vals]))
    xs = jnp.concatenate(
        [xs, jnp.zeros((n - k, 16), jnp.uint32)], axis=0)
    ys = nttmod.ntt(xs, log_n)
    rinv = pow(pow(2, 256, R_MOD), -1, R_MOD)
    got = [v * rinv % R_MOD
           for v in limbs.limbs_to_ints(np.asarray(ys[:4]))]
    dom = Domain(n)
    w = dom.omega
    want = [sum(vals[j] * pow(w, i * j, R_MOD) for j in range(k)) % R_MOD
            for i in range(4)]
    ok = got == want

    row = {
        "log_n": log_n, "iters": iters, "tag": tag,
        "steady_ms": round(steady * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "oracle_ok": ok,
        "profile_dir": profile_dir,
        "flags": {k_: v for k_, v in os.environ.items()
                  if k_.startswith("TPU_PLONK_")},
    }
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "bench_results", "ntt_probe.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
