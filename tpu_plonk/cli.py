"""Command-line entry: `python -m tpu_plonk.cli <cmd>`.

Commands:
  demo    build the MockCircuit, prove (host or device engine), verify,
          print per-round metrics JSON
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


def cmd_setup(cfg):
    from .pcs import srs as srs_mod
    t0 = time.time()
    srs = srs_mod.cached_setup((1 << cfg.log_gates) + 8)
    print(json.dumps({"max_degree": srs.max_degree,
                      "seconds": round(time.time() - t0, 2)}))
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
    if not argv or argv[0] not in ("demo", "setup", "info"):
        print("usage: python -m tpu_plonk.cli {demo|setup|info} [options]",
              file=sys.stderr)
        return 2
    from .utils.config import parse_args
    cfg = parse_args(argv[1:])
    return {"demo": cmd_demo, "setup": cmd_setup,
            "info": cmd_info}[argv[0]](cfg)


if __name__ == "__main__":
    sys.exit(main())
