"""KZG commitments on the TPU: SRS G1 powers resident on device,
polynomial coefficients arrive as Montgomery limb arrays straight from
the device prover engine, the chunked-CSR digit lists are built ON
DEVICE (pcs/csr_device.py — round 4; the round-2/3 host builder pulled
~67 MB of scalars and pushed ~100 MB of lists per 2^20 commit through
a ~2-14 MB/s tunnel), and only the 5.7 KB window sums leave for the
transcript (SURVEY.md §3.2 "commit" hot spots).  TPU_PLONK_MSM_DEVCSR=0
restores the host builder (also the automatic fallback on adversarial
bucket skew)."""

import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import device as dev
from . import msm_csr
from . import csr_device


def _use_devcsr() -> bool:
    """Tri-state default (CLAUDE.md r3 pattern): explicit env wins;
    otherwise ON for real devices, OFF for CPU — the interpret-mode
    walks there are slow and their unrolled grids are exactly the
    many-large-compiles shape that segfaults long-lived XLA CPU
    processes (tests opt in per-case with bits-narrowed scalars)."""
    env = _os.environ.get("TPU_PLONK_MSM_DEVCSR")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() not in ("cpu",)


class DeviceCommitter:
    """Bind a trimmed SRS to the device once; `commit` maps Montgomery
    coefficient arrays to affine G1 commitments.  Window width c is
    fixed per committer so every commit in a proof reuses one compiled
    MSM pipeline (static CSR shapes: fixed point count + fixed
    chunk/m2 on the device path, pad_windows on the host path).
    """

    def __init__(self, srs, max_len: int, c: int = None,
                 bits: int = 255):
        """bits bounds the scalars (always 255 in production; CPU
        interpret tests pass less to keep the unrolled walk grids —
        and so XLA CPU compile time — small).  c=None picks the
        measured-best width for the size (csr_device.default_c)."""
        if max_len > len(srs.powers_g1):
            raise ValueError("SRS too small for committed length")
        if c is None:
            c = csr_device.default_c(max_len, bits)
        self._bind(msm_csr.pack_points(srs.powers_g1[:max_len]),
                   max_len, c, bits)

    def _bind(self, points_packed, max_len: int, c: int, bits: int):
        """Shared init for SRS-backed and already-packed committers
        (pcs/srs_device.PackedCommitter)."""
        self.c = c
        self.bits = bits
        msm_csr._check_affine(points_packed)
        self.points = points_packed
        self.max_len = max_len
        self.n_windows = msm_csr.signed_window_count(c, bits)
        self.chunk = csr_device.default_chunk_device(max_len, c, bits)
        self.m2u = csr_device.default_m2_uniform(max_len, c, self.chunk)
        self.m2t = csr_device.default_m2_top(max_len, c, self.chunk,
                                             bits)

    # -- device-CSR path ---------------------------------------------------

    def _sums_device(self, coeffs_mont):
        """Dispatch one commit's window sums fully on device; returns
        (canonical_sums, max_u, max_t, (m2u, m2t)) device arrays
        (async), at the committer's CURRENT level-2 depths."""
        canon = dev.from_mont(coeffs_mont, dev.FR)
        n = canon.shape[0]
        if n < self.max_len:
            canon = jnp.concatenate([
                jnp.asarray(canon),
                jnp.zeros((self.max_len - n, canon.shape[1]),
                          jnp.asarray(canon).dtype)], axis=0)
        return csr_device.window_sums_device(
            self.points, canon, self.c, self.chunk, self.m2u, self.m2t,
            self.bits)

    def _finish_device(self, pulled_sums, mu, mt, coeffs_mont):
        """Validate the static level-2 depths; on (astronomically rare)
        skew overflow deepen PERSISTENTLY and retry — later commits then
        skip the undersized program.  Falling back to the host path is
        never needed for correctness."""
        while mu > self.m2u or mt > self.m2t:
            if mt >= (1 << 30):
                raise ValueError("commit: non-canonical scalar limbs "
                                 "(>= 2^255) reached the device MSM")
            self.m2u = max(self.m2u, -(-int(mu) // 16) * 16)
            self.m2t = max(self.m2t, -(-int(mt) // 16) * 16)
            sums_d, mud, mtd, _ = self._sums_device(coeffs_mont)
            pulled_sums, mu, mt = np.asarray(sums_d), int(mud), int(mtd)
        return msm_csr.fold_windows_host(
            msm_csr._canon_sums_to_host(np.asarray(pulled_sums)), self.c)

    # -- public API --------------------------------------------------------

    def high_g1(self, n: int, count: int = 3):
        """[tau^(n+k)]G1 for k < count, as host affine points.

        Pulled from the packed table (row i+1 holds [tau^i]G1; row 0
        is the identity CSR pad).  Lets blinded proving run from a
        cached DevicePK with NO host SRS — the scale path's
        configuration, which crashed in round 4 when _blind_commit
        reached for srs.powers_g1 (bench_results/r4_prove18_blind.log,
        VERDICT r4 task 2)."""
        if n + count > self.max_len:
            raise ValueError("packed SRS too short for blinding highs")
        from ..curves import device_g1 as dg1
        sub = np.asarray(self.points[n + 1:n + 1 + count])
        return tuple(dg1.points_from_device(
            (sub[:, 0], sub[:, 1], sub[:, 2])))

    def commit(self, coeffs_mont):
        n = coeffs_mont.shape[0]
        if n > self.max_len:
            raise ValueError("polynomial exceeds committed SRS")
        if _use_devcsr():
            sums_d, mud, mtd, _ = self._sums_device(coeffs_mont)
            return self._finish_device(np.asarray(sums_d), int(mud),
                                       int(mtd), coeffs_mont)
        canon = np.asarray(dev.from_mont(coeffs_mont, dev.FR))
        # zero-pad to the committed length: zero digits vanish from the
        # CSR lists, and a single point-array shape means every commit
        # in a proof reuses one compiled MSM
        canon = np.pad(canon, ((0, self.max_len - n), (0, 0)))
        l1, l2 = msm_csr.csr_from_limbs(canon, self.c, self.n_windows)
        s = msm_csr.window_sums(self.points, l1, l2, self.c)
        return msm_csr.fold_windows_host(msm_csr.sums_to_host(s), self.c)

    def _batch_k(self) -> int:
        """Polys per batched device program.  Memory-bounded: the
        batched walk keeps k * (l1 lists + per-row accumulators) live
        in one program (~100 MB + ~220 MB per poly at 2^20), and rule
        17c says big single programs get RESOURCE_EXHAUSTED long
        before HBM runs out — cap the batch so a program stays under
        ~1 GB of walk state.  TPU_PLONK_COMMIT_BATCH overrides."""
        env = _os.environ.get("TPU_PLONK_COMMIT_BATCH")
        if env:
            return max(1, int(env))
        return max(1, min(4, (1 << 21) // max(1, self.max_len)))

    def _pad_mont(self, coeffs_mont):
        n = coeffs_mont.shape[0]
        if n < self.max_len:
            a = jnp.asarray(coeffs_mont)
            return jnp.concatenate([
                a, jnp.zeros((self.max_len - n, a.shape[1]),
                             a.dtype)], axis=0)
        return jnp.asarray(coeffs_mont)

    def commit_many(self, coeffs_list, prefetch_cb=None):
        """Pipelined batch commit.  Device-CSR path: polynomials are
        grouped into batched programs (csr_device._commit_sums_many) of
        k = _batch_k() — one device dispatch per GROUP instead of per
        poly (the tunnel charges ~0.4 s per dispatch), and only one
        stacked ~6 KB/poly window-sums pull at the end.  Host path:
        CSR build overlapped with the device MSM of the previous
        polynomial.  prefetch_cb may enqueue later-round device work
        (msm_csr docstring)."""
        if _use_devcsr():
            kb = self._batch_k()
            pend = []          # (sums (k,W,3,24), max_u (k,), max_t (k,))
            for s in range(0, len(coeffs_list), kb):
                grp = coeffs_list[s:s + kb]
                stack = jnp.stack([self._pad_mont(cf) for cf in grp])
                pend.append(csr_device._commit_sums_many(
                    msm_csr._fused_tbl(self.points), stack, self.c,
                    self.chunk, self.m2u, self.m2t, self.bits,
                    interpret=jax.default_backend() in ("cpu",)))
            if prefetch_cb is not None:
                prefetch_cb()
            out = []
            for gi, (sums_d, mu_d, mt_d) in enumerate(pend):
                sums = np.asarray(sums_d)
                mus, mts = np.asarray(mu_d), np.asarray(mt_d)
                for i in range(sums.shape[0]):
                    out.append(self._finish_device(
                        sums[i], int(mus[i]), int(mts[i]),
                        coeffs_list[gi * kb + i]))
            return out
        return msm_csr.commit_many_packed(
            self.points, coeffs_list, self.c, self.n_windows,
            self.max_len, prefetch_cb=prefetch_cb)
