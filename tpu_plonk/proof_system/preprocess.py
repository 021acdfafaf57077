"""Preprocessing: composer tables -> ProverKey / VerifierKey
(SURVEY.md §2.8 "Preprocessing").

- pad gates to n = 2^k
- iNTT the 11 selector columns -> selector polynomials, plus their
  evaluations over the 4n extended coset (cached for the quotient round)
- sigma polynomials from the permutation cycles
- VerifierKey = KZG commitments to selectors + sigmas
"""

import dataclasses

from ..params import R_MOD
from ..fields import fr
from ..poly.domain import Domain
from ..cs.permutation import build_sigma_evals
from ..cs.composer import SELECTOR_NAMES
from ..pcs import kzg


@dataclasses.dataclass
class ProverKey:
    n: int
    domain: Domain
    ext_domain: Domain
    selector_coeffs: dict    # name -> coeff list
    selector_ext: dict       # name -> evals over 4n coset
    sigma_coeffs: list       # 4 coeff lists
    sigma_ext: list          # 4 eval lists over 4n coset
    wire_vars: dict          # padded wire index table (a/b/c/d -> [var])
    l1_ext: list             # L1(X) over 4n coset
    zh_inv_ext: list         # 1/Z_H(X) over 4n coset (period 4)
    coset_points: list       # the 4n coset points g*w4n^i


@dataclasses.dataclass
class VerifierKey:
    n: int
    selector_commits: dict   # name -> G1
    sigma_commits: list      # 4 G1 points

    def to_bytes(self) -> bytes:
        """8-byte LE n, then 48-byte compressed commitments in fixed
        order (selectors by SELECTOR_NAMES, then sigma 1..4) — the
        dusk-bytes-style layout for key exchange/persistence."""
        from ..curves import g1
        out = [self.n.to_bytes(8, "little")]
        out += [g1.to_bytes(self.selector_commits[name])
                for name in SELECTOR_NAMES]
        out += [g1.to_bytes(c) for c in self.sigma_commits]
        return b"".join(out)

    #: largest circuit size a decoded key may claim — bounds the SRS /
    #: domain work an UNTRUSTED .vk file can trigger downstream
    MAX_LOG_N = 28

    @staticmethod
    def from_bytes(data: bytes) -> "VerifierKey":
        from ..curves import g1
        expect = 8 + 48 * (len(SELECTOR_NAMES) + 4)
        if len(data) != expect:
            raise ValueError(
                f"VerifierKey encoding must be {expect} bytes")
        n = int.from_bytes(data[:8], "little")
        if n < 1 or n & (n - 1) or n > (1 << VerifierKey.MAX_LOG_N):
            raise ValueError(
                "VerifierKey n must be a power of two within bounds")
        off = 8
        sels = {}
        for name in SELECTOR_NAMES:
            sels[name] = g1.from_bytes(data[off:off + 48])
            off += 48
        sigmas = []
        for _ in range(4):
            sigmas.append(g1.from_bytes(data[off:off + 48]))
            off += 48
        return VerifierKey(n, sels, sigmas)


def circuit_fingerprint(composer) -> str:
    """Stable hash of the circuit STRUCTURE (selector columns, wire
    permutation, padded size) — the exact inputs of preprocessing.
    Public-input VALUES and witness are excluded on purpose: they don't
    affect ProverKey/VerifierKey, and including them would invalidate
    the preprocess cache on every new instance."""
    import hashlib
    h = hashlib.sha256()
    h.update(b"tpu-plonk ppdev v1\0")
    h.update(composer.padded_size().to_bytes(8, "little"))
    for name in SELECTOR_NAMES:
        col = composer.q[name]
        h.update(name.encode() + b"\0" + len(col).to_bytes(8, "little"))
        h.update(b"".join((v % R_MOD).to_bytes(32, "little")
                          for v in col))
    import numpy as np
    for w in "abcd":
        h.update(np.asarray(composer.wires[w], dtype=np.int64).tobytes())
    return h.hexdigest()[:20]


def preprocess_device_cached(composer, committer, cache_dir=None,
                             verbose=False):
    """preprocess_device with a disk cache keyed by circuit hash
    (VERDICT r2 #6 — selector/sigma coefficient tables and their
    commitments are circuit-static; at 2^18+ recomputing them costs
    ~10 min of device iNTTs + commit MSMs per session).  Coefficient
    limbs are stored as uint16 (Montgomery 16-bit limbs — lossless) so
    a 2^20 circuit caches in ~500 MB."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from ..curves import g1

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                 ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    fp = circuit_fingerprint(composer)
    path = os.path.join(cache_dir, f"ppdev_{fp}.npz")

    n = composer.padded_size()
    pad = n - composer.n_gates
    wire_vars = {w: composer.wires[w] + [0] * pad for w in "abcd"}

    if os.path.exists(path):
        if verbose:
            print(f"preprocess cache hit: {path}")
        z = np.load(path)
        # push the u16 limbs as-is (half the tunnel bytes) and KEEP
        # them u16 on device — DevicePK's resident form is u16 since
        # r5 (consumers widen in-program); the old u32 upcast pinned
        # ~6.7 GB of HBM at 2^22 for tables DevicePK duplicates
        sel_coeffs = {name: jnp.asarray(z[f"sel_{name}"])
                      for name in SELECTOR_NAMES}
        sigma_coeffs = [jnp.asarray(z[f"sigma_{i}"])
                        for i in range(4)]
        vk = VerifierKey.from_bytes(bytes(z["vk"].tobytes()))
        pk = ProverKey(n, Domain(n), Domain(4 * n), sel_coeffs, None,
                       sigma_coeffs, None, wire_vars, None, None, None)
        return pk, vk

    pk, vk = preprocess_device(composer, committer)

    def _u16(v):
        a = np.asarray(v)
        assert a.max(initial=0) < (1 << 16), \
            "coefficient limbs not 16-bit-canonical; cannot cache as u16"
        return a.astype(np.uint16)

    arrays = {f"sel_{k}": _u16(v)
              for k, v in pk.selector_coeffs.items()}
    arrays.update({f"sigma_{i}": _u16(v)
                   for i, v in enumerate(pk.sigma_coeffs)})
    arrays["vk"] = np.frombuffer(vk.to_bytes(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return pk, vk


def preprocess_device(composer, committer):
    """Scale-path preprocessing (2^18+): selector/sigma columns are
    converted once, iNTT'd on DEVICE, and committed through the device
    CSR MSM — no host NTT ever runs (the host transforms at 2^20 take
    hours; this takes seconds plus the commit MSMs).  Returns a
    ProverKey whose coefficient tables are device Montgomery arrays
    (engine_device.to_dev passes them through) with no host ext tables,
    and the VerifierKey.  VERDICT round-1 task 3."""
    from ..poly import ntt as nttmod
    from .engine_device import to_dev
    import jax.numpy as jnp

    n = composer.padded_size()
    log_n = n.bit_length() - 1
    dom = Domain(n)
    ext = Domain(4 * n)
    pad = n - composer.n_gates
    wire_vars = {w: composer.wires[w] + [0] * pad for w in "abcd"}

    sel_coeffs, sel_commits = {}, {}
    for name in SELECTOR_NAMES:
        col = to_dev(composer.q[name] + [0] * pad)
        coeffs = nttmod.intt(col, log_n)
        # store u16 (DevicePK's resident form; limbs carry 16 bits) —
        # keeping the u32 originals alive alongside DevicePK's copies
        # doubled the static-table HBM at 2^22
        sel_coeffs[name] = coeffs.astype(jnp.uint16)
        sel_commits[name] = committer.commit(coeffs)

    sigma_evals, _ = build_sigma_evals(composer, n)
    sigma_coeffs = []
    sigma_commits = []
    for se in sigma_evals:
        sc = nttmod.intt(to_dev(se), log_n)
        sigma_coeffs.append(sc.astype(jnp.uint16))
        sigma_commits.append(committer.commit(sc))

    pk = ProverKey(n, dom, ext, sel_coeffs, None, sigma_coeffs, None,
                   wire_vars, None, None, None)
    return pk, VerifierKey(n, sel_commits, sigma_commits)


def preprocess(composer, srs, light: bool = False):
    """light=True skips the 4n-sized host extended-coset tables — the
    device engine's phased quotient (engine_device.DevicePK) derives
    its per-phase data from the coefficient tables, so only the HOST
    oracle prover (prover.prove) needs the ext arrays.  At scale
    (2^18+) the host ext construction dominates preprocess time and
    memory, so the device path passes light=True."""
    n = composer.padded_size()
    dom = Domain(n)
    ext = Domain(4 * n)
    g = dom.coset_gen

    # --- padded tables ---
    pad = n - composer.n_gates
    selector_vals = {name: composer.q[name] + [0] * pad
                     for name in SELECTOR_NAMES}
    wire_vars = {w: composer.wires[w] + [0] * pad for w in "abcd"}

    sel_coeffs, sel_ext, sel_commits = {}, {}, {}
    for name in SELECTOR_NAMES:
        coeffs = dom.intt(selector_vals[name])
        sel_coeffs[name] = coeffs
        if not light:
            sel_ext[name] = ext.coset_ntt(coeffs)
        sel_commits[name] = kzg.commit(coeffs, srs)

    sigma_evals, _ = build_sigma_evals(composer, n)
    sigma_coeffs = [dom.intt(se) for se in sigma_evals]
    sigma_ext = (None if light
                 else [ext.coset_ntt(sc) for sc in sigma_coeffs])
    sigma_commits = [kzg.commit(sc, srs) for sc in sigma_coeffs]

    if light:
        pk = ProverKey(n, dom, ext, sel_coeffs, None, sigma_coeffs,
                       None, wire_vars, None, None, None)
        return pk, VerifierKey(n, sel_commits, sigma_commits)

    # --- cached extended-domain helpers (host oracle prover only) ---
    coset_points = [g * w % R_MOD for w in ext.elements()]
    # Z_H(g w4n^i) = g^n w4n^{in} - 1 has period 4 in i
    gn = pow(g, n, R_MOD)
    w4 = pow(ext.omega, n, R_MOD)  # 4th root of unity
    zh_vals = [(gn * pow(w4, j, R_MOD) - 1) % R_MOD for j in range(4)]
    zh_inv4 = fr.batch_inv(zh_vals)
    zh_inv_ext = [zh_inv4[i % 4] for i in range(4 * n)]
    # L1(X) = (X^n - 1) / (n (X - 1)) on the coset
    denoms = fr.batch_inv([(x - 1) % R_MOD for x in coset_points])
    zh_ext = [zh_vals[i % 4] for i in range(4 * n)]
    l1_ext = [zh_ext[i] * dom.n_inv % R_MOD * denoms[i] % R_MOD
              for i in range(4 * n)]

    pk = ProverKey(n, dom, ext, sel_coeffs, sel_ext, sigma_coeffs,
                   sigma_ext, wire_vars, l1_ext, zh_inv_ext, coset_points)
    vk = VerifierKey(n, sel_commits, sigma_commits)
    return pk, vk
