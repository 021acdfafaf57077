"""On-device CSR construction for the TPU MSM (round 4).

Round-3 profiling found the tunneled backend pulls device->host at
~2-14 MB/s and pushes at ~45-65 MB/s (bench_results/r4_probe.log,
scratch/tunnel_bw_probe.py): at 2^20 every commit spent ~5 s pulling
67 MB of canonical scalars to the host CSR builder and ~1.5 s pushing
~100 MB of bucket lists back — transfers were ~60% of the 136 s prove
(bench_results/prove_scale_20.json round breakdown).  This module
builds the same two-level chunked-CSR bucket lists (pcs/msm_csr.py
layout contract) entirely ON DEVICE, so a commit consumes its
coefficients where they already live and only the 5.7 KB window sums
ever cross the tunnel.

Design constraints and how they are met:

* XLA needs static shapes.  The host builder sizes the level-1 tensor
  by the data-dependent row count R = sum_b ceil(load_b / chunk); here
  R is padded to the static bound  R_max = W * (B + ceil(N / chunk))
  (each bucket wastes < 1 row, each window wastes < B part-rows).  The
  bound is tight when `chunk` is SMALL relative to the mean bucket
  load: walked slots are exactly W * (B*chunk + N), i.e. ~1.03x the
  useful adds at 2^20 with chunk=32 — *less* padding waste than the
  host layout's avg+1.6*sigma rows.  Pad rows hold zero entries, which
  the accumulate kernel treats as identity adds.
* No scatter: the build is sort + searchsorted + cumsum + gathers
  only.  Per window the (magnitude, signed-entry) pairs are sorted by
  magnitude (lax.sort_key_val, measured 0.09 s for 20 x 2^20 on the
  v5e), bucket boundaries come from searchsorted, and level-1 rows
  gather their entries from the sorted stream at computed offsets.
* Level 2 (rows per bucket) is data-dependent only through its depth
  M2 = max_b ceil(load_b / chunk).  M2 is a static parameter sized for
  Poisson-distributed loads (committers use >= 4x the mean row count);
  the true maximum is computed on device and returned so callers can
  verify and re-run with a bigger M2 on pathological digit skew —
  correctness never depends on the distribution assumption.

Reference analog: dusk-plonk's serial Pippenger bucket grouping under
KZG commit (SURVEY.md §2.6); this is its TPU-native, transfer-free
form.  Bit-compatibility contract: same bucket decomposition as
msm_csr.recode_signed (values, not layout), so window sums normalize
to identical affine points (tests/test_csr_device.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import device as dev
from . import msm_csr


def digits_signed(canon, c: int, n_windows: int, bits: int = 255):
    """(N, 16) u32 canonical 16-bit limbs -> (W, N) int32 signed digits
    in [-2^(c-1)+1, 2^(c-1)], value-preserving (same recoding as
    msm_csr.recode_signed).  Requires n_windows == ceil((bits+1)/c) ==
    signed_window_count(c, bits) for scalars < 2^bits — then the final
    carry is provably zero (top digit <= 2^(c-1) incl. the +1 carry).
    bits < 255 exists for the CPU interpret tests: every extra window
    is another unrolled kernel-body instance in the XLA graph."""
    if n_windows != -(-(bits + 1) // c):
        raise ValueError("device recode needs full-width windows")
    N = canon.shape[0]
    canon = canon.astype(jnp.uint32)
    ext = jnp.concatenate([canon, jnp.zeros((N, 1), jnp.uint32)], axis=1)
    mask = jnp.uint32((1 << c) - 1)
    cols = []
    for w in range(n_windows):
        bit = w * c
        li, sh = bit // 16, bit % 16
        lo = ext[:, li] >> jnp.uint32(sh)
        if sh:
            hi = ext[:, min(li + 1, 16)] << jnp.uint32(16 - sh)
        else:
            hi = jnp.zeros_like(lo)
        cols.append(((lo | hi) & mask).astype(jnp.int32))
    half = 1 << (c - 1)
    full = 1 << c
    out = []
    carry = jnp.zeros((N,), jnp.int32)
    for w in range(n_windows):
        d = cols[w] + carry
        carry = (d > half).astype(jnp.int32)
        out.append(d - carry * full)
    # carry out of the top window is 0 for canonical (<2^255) scalars:
    # the top unsigned digit has <= 255 - c*(W-1) + ... < c-1 bits.
    return jnp.stack(out)


def csr_device(canon, c: int, chunk: int, m2u: int, m2t: int,
               bits: int = 255):
    """Device two-level CSR build.  canon: (N, 16) u32 canonical limbs
    (zero scalars contribute nothing).  Static c / chunk / m2u / m2t.

    The level-2 table is SPLIT by window class: the W-1 low windows see
    near-uniform digit loads and get depth m2u, while the top window —
    whose digit takes only top_values(c) distinct values, concentrating
    ~N/top_values(c) entries per bucket — gets its own depth m2t.  A
    shared depth would pad every window's sequential walk to the top
    window's (the level-2 slot count is W*B*max vs
    (W-1)*B*m2u + B*m2t).

    Returns (l1, l2u, l2t, max_u, max_t):
      l1  (R_max, chunk)    int32 — signed 1-based point indices, 0 = pad;
      l2u (W-1, B, m2u)     int32 — 1-based l1 row ids per bucket, 0 = pad;
      l2t (B_top, m2t)      int32 — same, top window only, trimmed to
                            the static top-magnitude bound top_b(c)
                            (the walk grid is sequential per core, so
                            provably-empty lanes are pure waste);
      max_u / max_t ()      int32 — true per-bucket row maxima; the
      result is only valid when max_u <= m2u and max_t <= m2t (callers
      must check).
    """
    N = canon.shape[0]
    W = msm_csr.signed_window_count(c, bits)
    B = 1 << (c - 1)
    sd = digits_signed(canon, c, W, bits)               # (W, N)
    mag = jnp.abs(sd)
    idx1 = jnp.arange(1, N + 1, dtype=jnp.int32)[None, :]
    ent = jnp.where(sd < 0, -idx1, idx1)
    sk, sv = jax.lax.sort_key_val(mag, ent, dimension=1)

    # bucket boundaries in the sorted stream: bound[w, m] = first index
    # with sk[w, idx] >= m  (magnitude m entries live in
    # [bound[m], bound[m+1]); magnitude 0 = non-entries sort first)
    qs = jnp.arange(1, B + 2, dtype=jnp.int32)
    bound = jax.vmap(
        lambda a: jnp.searchsorted(a, qs, side="left"))(sk)  # (W, B+1)
    counts = (bound[:, 1:] - bound[:, :-1]).astype(jnp.int32)  # (W, B)
    nrows = -(-counts // chunk)                                # ceil
    max_u = jnp.max(nrows[:W - 1]) if W > 1 else jnp.int32(0)
    # entries beyond the static top-magnitude bound can only come from
    # NON-canonical (>= 2^255) scalars — contract violation; poison
    # max_t so callers fail loudly instead of silently dropping them
    bt0 = top_b(c, B, bits)
    max_t = jnp.max(nrows[W - 1, :bt0])
    if bt0 < B:
        max_t = jnp.where(jnp.max(counts[W - 1, bt0:]) > 0,
                          jnp.int32(1 << 30), max_t)

    nrows_flat = nrows.reshape(W * B)
    row_start = jnp.cumsum(nrows_flat) - nrows_flat            # exclusive
    R_max = W * (B + -(-N // chunk))
    R_max = -(-R_max // 256) * 256

    # level 1 by gather: row r belongs to the last flat bucket whose
    # row_start <= r (empty buckets collapse); k-th row of a bucket
    # reads sorted positions [start + k*chunk, ...) of its window
    r = jnp.arange(R_max, dtype=jnp.int32)
    fb = jnp.searchsorted(row_start, r, side="right") - 1
    fb = jnp.clip(fb, 0, W * B - 1)
    k = r - row_start[fb]
    valid_row = k < nrows_flat[fb]
    w_of = fb // B
    bstart = bound[:, :-1].reshape(W * B)      # sorted start per bucket
    cnt = counts.reshape(W * B)
    src0 = w_of * N + bstart[fb] + k * chunk
    j = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    off = k[:, None] * chunk + j
    valid = valid_row[:, None] & (off < cnt[fb][:, None])
    pos = jnp.clip(src0[:, None] + j, 0, W * N - 1)
    l1 = jnp.where(valid, jnp.take(sv.reshape(W * N), pos, axis=0), 0)

    rs2 = row_start.reshape(W, B, 1)
    k2u = jnp.arange(m2u, dtype=jnp.int32)[None, None, :]
    l2u = jnp.where(k2u < nrows[:W - 1, :, None],
                    rs2[:W - 1] + 1 + k2u, 0)
    bt = top_b(c, B, bits)
    k2t = jnp.arange(m2t, dtype=jnp.int32)[None, :]
    l2t = jnp.where(k2t < nrows[W - 1, :bt, None],
                    rs2[W - 1, :bt] + 1 + k2t, 0)
    return (l1, l2u.astype(jnp.int32), l2t.astype(jnp.int32),
            max_u, max_t)


def default_c(n: int, bits: int = 255) -> int:
    """Measured-best window width for the device-CSR MSM by size
    (chip data, r4): at 2^16 the sort/searchsorted CSR build scales
    with W while the bucket tables stay cheap, so narrower windows
    win (c=11: 296k pts/s vs c=13: 202k —
    bench_results/r4_batched_probe.json); at prover scales the W*N
    walk term dominates and c=13 is the measured optimum
    (bench_results/r4_csweep_probe.json).  Narrow-bits test configs
    keep windows few."""
    if bits < 255:
        return 8
    if n <= (1 << 16):
        return 11
    return 13


def default_chunk_device(n: int, c: int, bits: int = 255) -> int:
    """Static chunk minimizing walked level-1 slots W*(B*chunk + N)
    plus the split level-2 work (W-1)*B*m2u + B*m2t, in multiples of
    the kernel's CB=16."""
    W = msm_csr.signed_window_count(c, bits)
    B = 1 << (c - 1)
    best, best_cost = 16, None
    for chunk in (16, 32, 64, 128):
        m2u = default_m2_uniform(n, c, chunk)
        m2t = default_m2_top(n, c, chunk, bits)
        # level-2 slots walk projective-projective adds (~1.5x the
        # level-1 mixed add)
        cost = (W * (B * chunk + n)
                + 1.5 * ((W - 1) * B * m2u + top_b(c, B, bits) * m2t))
        if best_cost is None or cost < best_cost:
            best, best_cost = chunk, cost
    return best


def top_values(c: int, bits: int = 255) -> int:
    """Number of distinct values the TOP signed window's digit can take
    for canonical (< 2^255) scalars: bits above c*(W-1) plus the signed
    carry.  The top window is the skew driver — at c=12 it has 9 values
    so each top bucket holds ~N/9 entries, ~230x the uniform-window
    mean (the round-4 probe found every Poisson-sized shared m2
    overflowed, bench_results/devcsr_probe.json)."""
    W = msm_csr.signed_window_count(c, bits)
    top_bits = max(0, bits - c * (W - 1))
    return (1 << top_bits) + 1


def top_b(c: int, B: int = None, bits: int = 255) -> int:
    """Static bucket count of the trimmed top-window level-2 table:
    canonical scalars' top-window magnitudes are <= top_values(c), so
    buckets past that are provably empty (rounded to 16 lanes)."""
    if B is None:
        B = 1 << (c - 1)
    return min(B, -(-top_values(c, bits) // 16) * 16)


def default_m2_uniform(n: int, c: int, chunk: int) -> int:
    """Static level-2 depth for the W-1 near-uniform windows: >= 2x the
    mean per-bucket row count and >= mean + 8 rows.  Level-2 rows are
    walked sequentially whether occupied or not, so padding is pure
    kernel time; 2x mean is still > 12 sigma above a Poisson bucket
    load at prover scales (2^20, chunk 32: rows > 16 needs load > 512
    vs mean 256), and the runtime max check + committer persistent-
    deepen retry backstop adversarial skew — correctness never depends
    on the distribution (round-4 chip data: max_u 11 at 2^20 / 7 at
    2^18 vs the old 4x depths 32 / 16)."""
    B = 1 << (c - 1)
    mean_rows = max(1.0, n / B / chunk)
    m2 = max(2.0 * mean_rows, mean_rows + 8.0)
    return int(-(-m2 // 16) * 16)


def default_m2_top(n: int, c: int, chunk: int, bits: int = 255) -> int:
    """Static level-2 depth for the top window: its load concentrates
    on the top digit's reachable values (~n/that each), binomial
    margin on top.

    Sizing uses the REAL scalar bound min(2^bits, r) — canonical Fr
    scalars stop at r-1 ~ 2^254.86, so at c=13 the top digit reaches
    only ~232 of top_values(c)=257 slots and the per-bucket load is
    257/232 = 1.11x the 2^255-uniform estimate.  Sizing by 2^bits
    alone left 1.25x-margin proves one silent deepen-retry away from
    their first commit (the r4 batched-bench AssertionError was this,
    amplified: mod-r-folded 255-bit inputs double the low top-digit
    loads)."""
    from ..params import R_MOD
    W = msm_csr.signed_window_count(c, bits)
    eff_max = min((1 << bits) - 1, R_MOD - 1)
    top_count = (eff_max >> (c * (W - 1))) + 2
    top_load = n / top_count
    rows = (1.25 * top_load + 4.0 * (top_load ** 0.5)) / chunk
    m2 = max(float(default_m2_uniform(n, c, chunk)), rows + 2.0)
    return int(-(-m2 // 16) * 16)


@functools.partial(jax.jit,
                   static_argnames=("c", "chunk", "m2u", "m2t",
                                    "bits", "interpret"))
def _commit_sums(tbl, canon, c: int, chunk: int, m2u: int, m2t: int,
                 bits: int = 255, interpret: bool = False):
    """One device program: canonical coeffs -> CSR -> fused list walks
    (level 1, then level 2 split uniform/top) -> canonical (W, 3, 24)
    window sums + the two m2-validity scalars.  tbl is the committer's
    transposed affine (48, P) table (msm_csr._fused_tbl)."""
    from ..curves import pallas_g1 as plg
    from ..curves import device_g1 as dg1

    l1, l2u, l2t, max_u, max_t = csr_device(canon, c, chunk, m2u, m2t,
                                            bits)
    rx, ry, rz = plg.accumulate_csr(tbl, l1, affine=True,
                                    interpret=interpret)
    ix, iy, iz = dg1.identity(())
    tbl2 = jnp.concatenate([
        jnp.concatenate([ix[:, None], rx], axis=1),
        jnp.concatenate([iy[:, None], ry], axis=1),
        jnp.concatenate([iz[:, None], rz], axis=1)], axis=0)
    Wu, B, M2u = l2u.shape
    ux, uy, uz = plg.accumulate_csr(tbl2, l2u.reshape(Wu * B, M2u),
                                    affine=False, interpret=interpret)
    tx, ty, tz = plg.accumulate_csr(tbl2, l2t, affine=False,
                                    interpret=interpret)
    pad = B - l2t.shape[0]
    if pad:  # trimmed top buckets are identity by construction
        L = tx.shape[0]
        tx = jnp.concatenate(
            [tx, jnp.broadcast_to(ix[:, None], (L, pad))], axis=1)
        ty = jnp.concatenate(
            [ty, jnp.broadcast_to(iy[:, None], (L, pad))], axis=1)
        tz = jnp.concatenate(
            [tz, jnp.broadcast_to(iz[:, None], (L, pad))], axis=1)
    bx = jnp.concatenate([ux, tx], axis=1)
    by = jnp.concatenate([uy, ty], axis=1)
    bz = jnp.concatenate([uz, tz], axis=1)
    buckets = jnp.transpose(jnp.stack([bx, by, bz]),
                            (2, 0, 1)).reshape(Wu + 1, B, 3, 24)
    if interpret or jax.default_backend() in ("cpu",):
        sums = msm_csr._weighted_window_sums(buckets, c)
    else:
        sums = msm_csr._weighted_window_sums_pl(buckets, c)
    return dev.from_mont(sums, dev.FP), max_u, max_t


def window_sums_device(points_packed, canon, c: int, chunk: int = None,
                       m2u: int = None, m2t: int = None,
                       bits: int = 255, interpret: bool = None):
    """Full device MSM pipeline from on-device canonical limbs; returns
    (canonical_window_sums, max_u, max_t, (m2u, m2t)) — the sums as a
    device array plus the two true row maxima.  Callers must check
    max_u <= m2u and max_t <= m2t (msm_device / committer retry on
    overflow).  interpret defaults to True on CPU backends (the Mosaic
    kernels only lower for TPU; same convention as
    msm_csr.window_sums)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    n = canon.shape[0]
    if chunk is None:
        chunk = default_chunk_device(n, c, bits)
    if m2u is None:
        m2u = default_m2_uniform(n, c, chunk)
    if m2t is None:
        m2t = default_m2_top(n, c, chunk, bits)
    msm_csr._check_affine(points_packed)
    tbl = msm_csr._fused_tbl(points_packed)
    sums, max_u, max_t = _commit_sums(tbl, canon, c, chunk, m2u, m2t,
                                      bits, interpret=interpret)
    return sums, max_u, max_t, (m2u, m2t)


@functools.partial(jax.jit,
                   static_argnames=("c", "chunk", "m2u", "m2t",
                                    "bits", "interpret"))
def _commit_sums_many(tbl, mont_stack, c: int, chunk: int, m2u: int,
                      m2t: int, bits: int = 255,
                      interpret: bool = False):
    """Batched k-polynomial commit in ONE device program: (k, N, 16)
    Montgomery coeff stack -> (k, W, 3, 24) canonical window sums +
    (k,) max_u / (k,) max_t.  The tunneled backend charges ~0.35-0.4 s
    per dispatch (CLAUDE.md r3 item 16), so a prover round's 4-5
    commits as one program saves ~1.5 s of pure dispatch latency over
    the per-poly path — and the single walk's longer sequential grid
    amortizes kernel startup besides.

    Batching is pure concatenation against the SHARED point table:
    level-1 rows of poly i append below poly i-1's (accumulate_csr
    rows are independent), level-2 row ids shift by i*R1, and the
    weighted window sums treat the batch as k*W independent windows.
    Bit-exact per poly vs _commit_sums (tests/test_csr_device.py)."""
    from ..curves import pallas_g1 as plg
    from ..curves import device_g1 as dg1

    k, N = mont_stack.shape[0], mont_stack.shape[1]
    canon = dev.from_mont(mont_stack, dev.FR)
    parts = [csr_device(canon[i], c, chunk, m2u, m2t, bits)
             for i in range(k)]
    R1 = parts[0][0].shape[0]
    l1 = jnp.concatenate([p[0] for p in parts], axis=0)
    max_u = jnp.stack([p[3] for p in parts])
    max_t = jnp.stack([p[4] for p in parts])

    rx, ry, rz = plg.accumulate_csr(tbl, l1, affine=True,
                                    interpret=interpret)
    ix, iy, iz = dg1.identity(())
    tbl2 = jnp.concatenate([
        jnp.concatenate([ix[:, None], rx], axis=1),
        jnp.concatenate([iy[:, None], ry], axis=1),
        jnp.concatenate([iz[:, None], rz], axis=1)], axis=0)

    # level-2 ids: nonzero entries of poly i shift by i*R1 into the
    # concatenated level-1 row space (0 stays the shared pad/identity)
    def shift(a, i):
        return jnp.where(a > 0, a + jnp.int32(i * R1), 0)

    Wu, B, M2u = parts[0][1].shape
    l2u = jnp.concatenate(
        [shift(p[1], i) for i, p in enumerate(parts)], axis=0)
    l2t = jnp.stack([shift(p[2], i) for i, p in enumerate(parts)])
    Bt, M2t = l2t.shape[1:]
    ux, uy, uz = plg.accumulate_csr(tbl2, l2u.reshape(k * Wu * B, M2u),
                                    affine=False, interpret=interpret)
    tx, ty, tz = plg.accumulate_csr(tbl2, l2t.reshape(k * Bt, M2t),
                                    affine=False, interpret=interpret)
    L = ux.shape[0]
    pad = B - Bt
    if pad:  # trimmed top buckets are identity by construction
        tx = jnp.concatenate([tx.reshape(L, k, Bt),
                              jnp.broadcast_to(ix[:, None, None],
                                               (L, k, pad))], axis=2)
        ty = jnp.concatenate([ty.reshape(L, k, Bt),
                              jnp.broadcast_to(iy[:, None, None],
                                               (L, k, pad))], axis=2)
        tz = jnp.concatenate([tz.reshape(L, k, Bt),
                              jnp.broadcast_to(iz[:, None, None],
                                               (L, k, pad))], axis=2)
    else:
        tx, ty, tz = (t.reshape(L, k, B) for t in (tx, ty, tz))
    bx = jnp.concatenate([ux.reshape(L, k, Wu * B), tx], axis=2)
    by = jnp.concatenate([uy.reshape(L, k, Wu * B), ty], axis=2)
    bz = jnp.concatenate([uz.reshape(L, k, Wu * B), tz], axis=2)
    W = Wu + 1
    buckets = jnp.transpose(jnp.stack([bx, by, bz]),
                            (2, 3, 0, 1)).reshape(k * W, B, 3, 24)
    if interpret or jax.default_backend() in ("cpu",):
        sums = msm_csr._weighted_window_sums(buckets, c)
    else:
        sums = msm_csr._weighted_window_sums_pl(buckets, c)
    return (dev.from_mont(sums, dev.FP).reshape(k, W, 3, 24),
            max_u, max_t)


def msm_device(points_packed, canon, c: int, chunk: int = None,
               bits: int = 255, interpret: bool = None):
    """Blocking device-CSR MSM: canonical limbs -> affine host point.
    Retries with a deeper level 2 on (astronomically rare /
    adversarial) bucket skew."""
    n = canon.shape[0]
    if chunk is None:
        chunk = default_chunk_device(n, c, bits)
    m2u = m2t = None
    while True:
        sums, max_u, max_t, (m2u, m2t) = window_sums_device(
            points_packed, canon, c, chunk, m2u, m2t, bits,
            interpret=interpret)
        mu, mt = int(max_u), int(max_t)
        if mt >= (1 << 30):
            raise ValueError("msm_device: non-canonical (>= 2^255) "
                             "scalar in canon input")
        if mu <= m2u and mt <= m2t:
            break
        m2u = max(m2u, -(-mu // 16) * 16)
        m2t = max(m2t, -(-mt // 16) * 16)
    host = msm_csr._canon_sums_to_host(np.asarray(sums))
    return msm_csr.fold_windows_host(host, c)
