"""End-to-end scale prove on one TPU chip (VERDICT round-1 task 3 /
BASELINE.json configs 3-4): build a 2^log_gates circuit, generate the
SRS on device, preprocess on device (phased, no host NTTs), prove with
the device engine + CSR MSM commits, verify with the host verifier.

Usage:  python scripts/prove_scale.py [log_gates] [--poseidon]
            [--blind] [--tag=NAME]
Prints one JSON line with stage timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def build_circuit(log_gates: int, poseidon: bool):
    from tpu_plonk.cs import Composer
    from tpu_plonk.gadgets import poseidon as pos

    cs = Composer()
    prev = cs.add_input(3)
    if poseidon:
        # config-3 shape: Poseidon sponge gadgets + arithmetic fill
        h = pos.sponge_gadget(cs, [prev, cs.add_input(5), cs.add_input(7),
                                   cs.add_input(11)])
        prev = h
    target = (1 << log_gates) - 1
    while cs.n_gates < target:
        prev = cs.mul(1, prev, prev, 3)
    return cs


def main():
    log_gates = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    poseidon = "--poseidon" in sys.argv
    # --blind: the ZK variant (seed-derived blinding, 8-phase quotient,
    # 1088-byte proofs) — BASELINE has no scale datapoint for it
    blind = b"prove-scale-blind-seed" if "--blind" in sys.argv else None
    tag = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--tag=")), "")

    from tpu_plonk.pcs import srs_device
    from tpu_plonk.pcs.msm_csr import signed_window_count  # noqa: F401
    from tpu_plonk.proof_system.preprocess import (
        preprocess_device_cached)
    from tpu_plonk.proof_system.engine_device import prove_device, DevicePK
    from tpu_plonk.proof_system.verifier import verify

    out = {"log_gates": log_gates, "poseidon": poseidon, "tag": tag,
           "blind": blind is not None,
           "device": str(jax.devices()[0]),
           "flags": {k: v for k, v in os.environ.items()
                     if k.startswith("TPU_PLONK_")}}

    res_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results")
    os.makedirs(res_dir, exist_ok=True)
    suffix = f"_{tag}" if tag else ""
    partial_path = os.path.join(
        res_dir, f"prove_scale_{log_gates}{suffix}.partial.json")

    def save_partial():
        # stage-by-stage checkpoint: a watchdog-killed run still
        # documents how far it got and what each stage cost
        with open(partial_path + ".tmp", "w") as f:
            json.dump(out, f)
        os.replace(partial_path + ".tmp", partial_path)

    t0 = time.time()
    cs = build_circuit(log_gates, poseidon)
    n = cs.padded_size()
    out["n"] = n
    out["compose_s"] = round(time.time() - t0, 1)
    print("composed", out, flush=True)
    save_partial()

    t0 = time.time()
    packed = srs_device.device_srs_points(n + 8)
    out["srs_s"] = round(time.time() - t0, 1)
    print("srs ready", flush=True)
    save_partial()

    committer = srs_device.PackedCommitter(packed)

    t0 = time.time()
    pk, vk = preprocess_device_cached(cs, committer, verbose=True)
    out["preprocess_s"] = round(time.time() - t0, 1)
    print("preprocessed %.1fs" % out["preprocess_s"], flush=True)
    save_partial()

    t0 = time.time()
    dpk = DevicePK(pk)
    out["devicepk_s"] = round(time.time() - t0, 1)
    save_partial()

    t0 = time.time()
    proof = prove_device(cs, pk, None, dpk=dpk,
                         commit_fn=committer.commit,
                         commit_many_fn=committer.commit_many,
                         blinding_seed=blind)
    out["prove_first_s"] = round(time.time() - t0, 1)
    print("prove first %.1fs" % out["prove_first_s"], flush=True)
    save_partial()

    from tpu_plonk.utils.metrics import Metrics
    met = Metrics()
    t0 = time.time()
    proof = prove_device(cs, pk, None, dpk=dpk,
                         commit_fn=committer.commit,
                         commit_many_fn=committer.commit_many,
                         metrics=met, blinding_seed=blind)
    out["prove_steady_s"] = round(time.time() - t0, 1)
    out["gates_per_s"] = round(n / out["prove_steady_s"], 0)
    out["rounds"] = {k: round(v, 2) for k, v in met.to_dict().items()}

    # host verification (g2 pair from the device SRS derivation)
    class _SrsShim:
        g2_gen, g2_tau = srs_device.srs_g2()
    t0 = time.time()
    ok = verify(proof, vk, cs.pi, _SrsShim)
    out["verify_s"] = round(time.time() - t0, 2)
    out["verified"] = bool(ok)
    print(json.dumps(out), flush=True)
    with open(os.path.join(res_dir,
                           f"prove_scale_{log_gates}{suffix}.json"),
              "w") as f:
        json.dump(out, f)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    assert ok


if __name__ == "__main__":
    main()
