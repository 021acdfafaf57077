"""Command-line entry: `python -m tpu_plonk.cli <cmd>`.

Commands:
  demo    build the MockCircuit, prove (host or device engine), verify,
          print per-round metrics JSON
  prove   prove the MockCircuit and write <out>.proof/.vk/.pi artifacts
  verify  load <out>.proof/.vk/.pi and verify (validating codecs — the
          untrusted-input path)
  setup   generate + cache a deterministic SRS
  info    environment / device report
"""

import json
import sys
import time


def cmd_demo(cfg):
    from .circuits.mock_circuit import build_mock_circuit
    from .pcs import srs as srs_mod
    from .proof_system.preprocess import preprocess
    from .proof_system.prover import prove
    from .proof_system.verifier import verify
    from .utils.metrics import Metrics

    met = Metrics()
    with met.timed("compose"):
        composer, _pub = build_mock_circuit(
            note_value=10_000, private_key=0xDEADBEEF,
            hash_inputs=[1, 2, 3, 4], tx_value=7_000, gas_fee=500)
    met.count("gates", composer.n_gates)
    met.count("padded", composer.padded_size())
    with met.timed("srs"):
        srs = srs_mod.cached_setup(composer.padded_size() + 8)
    with met.timed("preprocess"):
        pk, vk = preprocess(composer, srs)
    ckpt = None
    if cfg.checkpoint:
        from .utils.checkpoint import RoundCheckpoint
        ckpt = RoundCheckpoint(cfg.checkpoint)
        if ckpt.completed():
            met.count("resumed_rounds", len(ckpt.completed()))
    with met.timed("prove"):
        if cfg.engine == "device":
            from .proof_system.engine_device import prove_device
            from .pcs.commit_device import DeviceCommitter
            # device commits win above ~2^13 points (BASELINE.md)
            commit_fn = None
            if composer.padded_size() >= (1 << 13):
                com = DeviceCommitter(srs, composer.padded_size(), c=4)
                commit_fn = com.commit
            proof = prove_device(
                composer, pk, srs, metrics=met, commit_fn=commit_fn,
                blinding_seed=cfg.blind.encode() or None)
        else:
            proof = prove(composer, pk, srs, ckpt=ckpt,
                          blinding_seed=cfg.blind.encode() or None)
    with met.timed("verify"):
        ok = verify(proof, vk, composer.pi, srs)
    met.count("proof_bytes", len(proof.to_bytes()))
    out = met.to_dict()
    out["verified"] = ok
    print(json.dumps(out, sort_keys=True))
    return 0 if ok else 1


def _mock_circuit(cfg):
    from .circuits.mock_circuit import build_mock_circuit
    composer, _pub = build_mock_circuit(
        note_value=10_000, private_key=0xDEADBEEF,
        hash_inputs=[1, 2, 3, 4], tx_value=7_000, gas_fee=500)
    return composer


def cmd_prove(cfg):
    """Prove the demo circuit; write proof/vk/public-input artifacts
    (dusk-bytes-style encodings) under the --out prefix."""
    if not cfg.out:
        print("prove needs --out <prefix>", file=sys.stderr)
        return 2
    from .pcs import srs as srs_mod
    from .proof_system.preprocess import preprocess
    from .proof_system.prover import prove

    composer = _mock_circuit(cfg)
    srs = srs_mod.cached_setup(composer.padded_size() + 8)
    pk, vk = preprocess(composer, srs)
    if cfg.engine == "device":
        from .proof_system.engine_device import prove_device
        proof = prove_device(composer, pk, srs,
                             blinding_seed=cfg.blind.encode() or None)
    else:
        proof = prove(composer, pk, srs,
                      blinding_seed=cfg.blind.encode() or None)
    with open(cfg.out + ".proof", "wb") as f:
        f.write(proof.to_bytes())
    with open(cfg.out + ".vk", "wb") as f:
        f.write(vk.to_bytes())
    with open(cfg.out + ".pi", "w") as f:
        json.dump({str(k): v for k, v in composer.pi.items()}, f)
    print(json.dumps({"proof_bytes": len(proof.to_bytes()),
                      "out": cfg.out}))
    return 0


def cmd_verify(cfg):
    """Load artifacts written by `prove` and verify.  Everything comes
    through the validating from_bytes codecs — this is the
    untrusted-input path a proof consumer runs."""
    if not cfg.out:
        print("verify needs --out <prefix>", file=sys.stderr)
        return 2
    from .pcs import srs as srs_mod
    from .proof_system.proof import Proof
    from .proof_system.preprocess import VerifierKey
    from .proof_system.verifier import verify

    try:
        with open(cfg.out + ".proof", "rb") as f:
            proof = Proof.from_bytes(f.read())
        with open(cfg.out + ".vk", "rb") as f:
            vk = VerifierKey.from_bytes(f.read())
        with open(cfg.out + ".pi") as f:
            from .params import R_MOD
            pi = {int(k): int(v) % R_MOD
                  for k, v in json.load(f).items()}
    except (ValueError, TypeError, OSError, json.JSONDecodeError) as e:
        print(json.dumps({"verified": False,
                          "error": f"{type(e).__name__}: {e}"}))
        return 1
    srs = srs_mod.cached_setup(vk.n + 8)
    t0 = time.time()
    ok = verify(proof, vk, pi, srs)
    print(json.dumps({"verified": ok,
                      "verify_ms": round((time.time() - t0) * 1e3, 1)}))
    return 0 if ok else 1


def cmd_setup(cfg):
    from .pcs import srs as srs_mod
    t0 = time.time()
    srs = srs_mod.cached_setup((1 << cfg.log_gates) + 8)
    print(json.dumps({"max_degree": srs.max_degree,
                      "seconds": round(time.time() - t0, 2)}))
    return 0


def cmd_cache_warm(cfg):
    """Warm every disk cache a scale prove needs (VERDICT r2 #6):
    device SRS points, preprocess products (selector/sigma coeffs +
    commitments, keyed by circuit hash), and — as a side effect of one
    throwaway prove at the target size — the persistent XLA compile
    cache.  After this, a fresh session reaches steady-prove in minutes
    instead of ~30+."""
    import jax
    from .cs import Composer
    from .pcs import srs_device
    from .proof_system.preprocess import preprocess_device_cached
    from .proof_system.engine_device import prove_device, DevicePK

    t0 = time.time()
    cs = Composer()
    prev = cs.add_input(3)
    while cs.n_gates < (1 << cfg.log_gates) - 1:
        prev = cs.mul(1, prev, prev, 3)
    n = cs.padded_size()
    packed = srs_device.device_srs_points(n + 8)
    srs_s = round(time.time() - t0, 1)
    t0 = time.time()
    committer = srs_device.PackedCommitter(packed)
    pk, vk = preprocess_device_cached(cs, committer, verbose=True)
    pp_s = round(time.time() - t0, 1)
    t0 = time.time()
    dpk = DevicePK(pk)
    prove_device(cs, pk, None, dpk=dpk, commit_fn=committer.commit,
                 commit_many_fn=committer.commit_many)
    print(json.dumps({"n": n, "srs_s": srs_s, "preprocess_s": pp_s,
                      "prove_compile_s": round(time.time() - t0, 1),
                      "backend": jax.default_backend()}))
    return 0


def cmd_info(_cfg):
    import jax
    print(json.dumps({
        "devices": [str(d) for d in jax.devices()],
        "backend": jax.default_backend(),
    }))
    return 0


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cmds = {"demo": cmd_demo, "prove": cmd_prove, "verify": cmd_verify,
            "setup": cmd_setup, "info": cmd_info,
            "cache-warm": cmd_cache_warm}
    if not argv or argv[0] not in cmds:
        print("usage: python -m tpu_plonk.cli "
              "{demo|prove|verify|setup|info|cache-warm} [options]",
              file=sys.stderr)
        return 2
    from .utils.config import parse_args
    cfg = parse_args(argv[1:])
    return cmds[argv[0]](cfg)


if __name__ == "__main__":
    sys.exit(main())
