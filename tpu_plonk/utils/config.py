"""Typed configuration (SURVEY.md §5.6): circuit size, mesh shape, MSM
window, NTT decomposition — a dataclass + argparse, no dynamic flag
system."""

import argparse
import dataclasses


@dataclasses.dataclass
class Config:
    log_gates: int = 10           # circuit size target (2^k gates)
    msm_window_bits: int = 8      # Pippenger c
    mesh_devices: int = 1         # devices on the 'shard' axis
    engine: str = "host"          # 'host' | 'device'
    checkpoint: str = ""          # round-boundary resume file ('' = off)
    blind: str = ""               # ZK blinding seed ('' = deterministic)
    out: str = ""                 # artifact path prefix for prove/verify
    srs_seed: bytes = b"tpu-plonk insecure srs"
    label: bytes = b"plonk"


def parse_args(argv=None) -> Config:
    p = argparse.ArgumentParser(prog="tpu-plonk")
    p.add_argument("--log-gates", type=int, default=10)
    p.add_argument("--msm-window-bits", type=int, default=8)
    p.add_argument("--mesh-devices", type=int, default=1)
    p.add_argument("--engine", choices=["host", "device"], default="host")
    p.add_argument("--checkpoint", default="",
                   help="resume file: prover rounds memoized at this "
                        "path survive a crash/restart")
    p.add_argument("--blind", default="",
                   help="ZK variant: seed for deterministic blinding "
                        "(5-chunk quotient, 1088-byte proofs); keep "
                        "the seed secret and fresh per proof")
    p.add_argument("--out", default="",
                   help="artifact path prefix: prove writes "
                        "<out>.proof/.vk/.pi, verify reads them")
    a = p.parse_args(argv)
    return Config(log_gates=a.log_gates,
                  msm_window_bits=a.msm_window_bits,
                  mesh_devices=a.mesh_devices, engine=a.engine,
                  checkpoint=a.checkpoint, blind=a.blind, out=a.out)
