"""TPU Pippenger MSM, round-2 design: signed digits + host-built CSR
bucket lists + device gather-accumulate (the framework's headline
kernel; BASELINE.md metric "MSM points/sec/chip").

Why this shape (vs the round-1 masked-sweep kernel): profiling showed
the per-step masked full-bucket-array sweeps bound the old kernel —
traffic scaled with lanes*W*2^c per step, ~100x off compute bound.
Here the bucket layout is inverted: the host groups point indices by
(window, bucket) into a padded CSR index tensor, and the device walks
the lists with a gather + one batched complete add per step, so

  * every EC add in the accumulation is USEFUL work (list slots, not
    bucket sweeps): total adds ~= N*W + padding slack;
  * signed digits halve the bucket count (2^(c-1) vs 2^c), letting c
    grow to 12-13 where N*ceil(256/c) is ~3x smaller than the old c=4;
  * the trace holds a handful of point-add instances regardless of
    N/W/c (fori_loop/scan), keeping XLA compile time flat;
  * the bucket weighted sum runs as a two-level running-sum scan with
    ~2*sqrt(B) sequential steps instead of 2^c.

Reference analog: dusk-plonk's serial Pippenger under KZG commit
(SURVEY.md §2.6, §7 hard part 5).  Sharded version: dist/msm_sharded.
"""

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import device as dev
from ..fields import limbs
from ..curves import g1
from ..curves import device_g1 as dg1

FP = dev.FP


# ---------------------------------------------------------------------------
# host side: digits, signed recoding, CSR build (vectorized numpy)
# ---------------------------------------------------------------------------

def limbs_to_digits(canon: np.ndarray, c: int, n_windows: int = None):
    """(N, L) canonical 16-bit limbs -> (W, N) unsigned c-bit digits.
    Digits may span limb boundaries; fully vectorized."""
    canon = np.asarray(canon, dtype=np.uint32)
    n, L = canon.shape
    total_bits = 16 * L
    if n_windows is None:
        n_windows = (total_bits + c - 1) // c
    ext = np.concatenate([canon, np.zeros((n, 1), np.uint32)], axis=1)
    out = np.empty((n_windows, n), dtype=np.int32)
    mask = (1 << c) - 1
    for w in range(n_windows):
        bit = w * c
        li, sh = bit // 16, bit % 16
        lo = ext[:, li] >> sh
        hi = (ext[:, min(li + 1, L)] << (16 - sh)) if sh else 0
        out[w] = ((lo | hi) & mask).astype(np.int32)
    return out


def recode_signed(digits: np.ndarray, c: int) -> np.ndarray:
    """Balanced (signed) digit recoding: (W, N) unsigned digits in
    [0, 2^c) -> digits in [-2^(c-1)+1, 2^(c-1)]; value preserved:
    sum d_w 2^(cw) unchanged.  A carry is generated only when
    d > 2^(c-1) (keeping +2^(c-1) representable in-window), so when the
    top window has <= c-1 significant bits — always true for full
    255-bit scalars with c not dividing 255 — no overflow window is
    needed.  Trailing all-zero windows are dropped."""
    W, n = digits.shape
    out = np.empty((W + 1, n), dtype=np.int32)
    carry = np.zeros(n, dtype=np.int32)
    half = 1 << (c - 1)
    full = 1 << c
    for w in range(W):
        d = digits[w] + carry
        carry = (d > half).astype(np.int32)
        out[w] = d - carry * full
    out[W] = carry
    top = W + 1
    while top > 1 and not out[top - 1].any():
        top -= 1
    return out[:top]


def signed_window_count(c: int, bits: int = 255) -> int:
    """Static signed-window count for full-width scalars (used by
    callers that need shape stability across calls — e.g. committers):
    ceil(bits/c), +1 only when c divides bits (then the top unsigned
    window is full-width and can carry out)."""
    w = -(-bits // c)
    return w + 1 if bits % c == 0 else w


def pad_windows(sdigits: np.ndarray, n_windows: int) -> np.ndarray:
    """Pad (or validate) recoded digits to a static window count."""
    W = sdigits.shape[0]
    if W > n_windows:
        raise ValueError("digits exceed requested window count")
    if W == n_windows:
        return sdigits
    pad = np.zeros((n_windows - W, sdigits.shape[1]), np.int32)
    return np.concatenate([sdigits, pad], axis=0)


def build_csr(sdigits: np.ndarray, c: int, chunk: int = None,
              pad_rows: int = 256, pad_m2: int = 16):
    """Signed digits (W, N) -> chunked two-level CSR bucket lists.

    Level 1: every (window, bucket) list is chopped into chunks of
    exactly `chunk` entries (last chunk padded with 0); each chunk is a
    row of `l1` (R, chunk) int32, entries +-(point_index + 1), sign =
    digit sign.  Level 2: `l2` (W, B, M2) int32 lists the 1-based row
    ids belonging to each bucket (0 = pad).  Chunking bounds the device
    loop depth by `chunk` + M2 even when digits concentrate in a few
    buckets (the top scalar window always does), which a flat
    max-bucket-load layout cannot.

    Degenerate digit skew (all points in one bucket) just grows M2 to
    ~N/chunk; depth stays O(chunk + N/chunk) = O(sqrt N) at the default
    chunk ~ sqrt(avg load) scaling."""
    W, n = sdigits.shape
    B = 1 << (c - 1)
    if chunk is None:
        chunk = default_chunk(n, c)
    mag = np.abs(sdigits)                     # (W, N) in [0, B]
    order = np.argsort(mag, axis=1, kind="stable")
    mag_s = np.take_along_axis(mag, order, axis=1)
    sign_s = np.take_along_axis(sdigits < 0, order, axis=1)
    # per-(window,magnitude) counts and exclusive starts
    flat = (np.arange(W, dtype=np.int64)[:, None] * (B + 1) +
            mag_s.astype(np.int64)).ravel()
    counts = np.bincount(flat, minlength=W * (B + 1)).reshape(W, B + 1)
    starts = np.cumsum(counts, axis=1) - counts
    slot = np.arange(n, dtype=np.int64)[None, :] - \
        np.take_along_axis(starts, mag_s.astype(np.int64), axis=1)
    valid = mag_s > 0

    # row bookkeeping: bucket (w, b) owns ceil(count/chunk) rows
    nz_counts = counts[:, 1:]                 # (W, B)
    nrows = -(-nz_counts // chunk)            # ceil div
    row_start = np.cumsum(nrows.ravel()) - nrows.ravel()
    row_start = row_start.reshape(W, B)
    r_total = int(nrows.sum())
    R = max(pad_rows, -(-r_total // pad_rows) * pad_rows)
    m2_max = int(nrows.max()) if r_total else 0
    M2 = max(pad_m2, -(-m2_max // pad_m2) * pad_m2)

    l1 = np.zeros((R, chunk), dtype=np.int32)
    entries = np.where(sign_s, -(order + 1), order + 1).astype(np.int32)
    bstart = np.take_along_axis(row_start,
                                np.maximum(mag_s - 1, 0).astype(np.int64),
                                axis=1)
    rows = bstart + slot // chunk
    l1[rows[valid], (slot % chunk)[valid]] = entries[valid]

    l2 = np.zeros((W, B, M2), dtype=np.int32)
    k = np.arange(M2)[None, None, :]
    l2_vals = row_start[:, :, None] + 1 + k
    l2[:] = np.where(k < nrows[:, :, None], l2_vals, 0)
    return l1, l2


def default_chunk(n: int, c: int) -> int:
    """Level-1 row length.  Total accumulate work is
    chunk * E[ceil(load/chunk)] slots per bucket (load ~ Poisson(avg));
    the old avg + 4*sigma choice made every bucket one padded row —
    1.5x the useful work at typical loads.  avg + 1.6*sigma minimizes
    the expected slot count (~1.26x): ~5% of buckets spill into a
    second, mostly-empty row, which the two-level CSR already handles.
    8-aligned (chunk is only the device loop trip count — lanes are
    the ROW dimension — so no 32/128 alignment is needed)."""
    B = 1 << (c - 1)
    avg = max(1.0, n / B)
    chunk = int(avg + 1.6 * avg ** 0.5)
    return max(32, min(1 << 14, -(-chunk // 8) * 8))


def csr_from_limbs(canon: np.ndarray, c: int, n_windows: int = None,
                   chunk: int = None):
    """(N, 16) canonical limbs -> (l1, l2) chunked CSR.  Uses the C
    builder (tpu_plonk/native) when available — the numpy pipeline
    costs ~4 s at 2^18 on this class of host, the C pass ~50 ms — and
    falls back to the numpy path otherwise (bit-identical layout,
    asserted in tests)."""
    n = canon.shape[0]
    if chunk is None:
        chunk = default_chunk(n, c)
    if n_windows is None or n_windows == signed_window_count(c):
        from .. import native
        w = signed_window_count(c)
        out = native.build_csr_native(canon, c, w, chunk)
        if out is not None:
            return out
        n_windows = w
    else:
        # explicit narrow windows may carry into one extra window
        n_windows += 1
    sd = pad_windows(recode_signed(limbs_to_digits(canon, c), c),
                     n_windows)
    return build_csr(sd, c, chunk=chunk)


def scalars_to_csr(scalars, c: int, n_windows: int = None):
    """Host ints -> chunked CSR tensors (helper for the host API)."""
    from ..params import R_MOD
    canon = np.asarray(limbs.ints_to_limbs(
        [int(s) % R_MOD for s in scalars], 16))
    return build_csr(recode_signed(limbs_to_digits(canon, c, n_windows),
                                   c), c)


def pack_points(points) -> jnp.ndarray:
    """Affine host points -> (N+1, 3, 24) u32 Montgomery projective with
    row 0 = identity (the CSR padding target)."""
    x, y, z = dg1.points_to_device([None] + list(points))
    return jnp.stack([x, y, z], axis=1)


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

def _as_tuple(a):
    return (a[..., 0, :], a[..., 1, :], a[..., 2, :])


def _accumulate_impl(points, idx):
    """points (P, 3, 24) with row 0 = identity; idx (R, M) signed
    1-based entries, 0 = pad.  Returns per-row sums (R, 3, 24).  One
    gather + one batched complete add per list step; exactly one
    point-add instance in the trace (compile time flat in R/M).

    Un-jitted on purpose: the sharded path traces it inside shard_map,
    and a jit closure first traced in a manual-sharding context poisons
    its cache for top-level reuse (see poly/ntt.py `ntt_batched`)."""
    def body(m, acc):
        e = jax.lax.dynamic_index_in_dim(idx, m, axis=1, keepdims=False)
        rows = jnp.abs(e)
        g = jnp.take(points, rows, axis=0)          # (R, 3, 24)
        gx, gy, gz = _as_tuple(g)
        gy = jnp.where((e < 0)[:, None],
                       dev.neg_mod(gy, FP), gy)
        return _stack3(dg1.add(_as_tuple(acc), (gx, gy, gz)))

    acc0 = _stack3(dg1.identity((idx.shape[0],)))
    return jax.lax.fori_loop(0, idx.shape[1], body, acc0)


_accumulate = jax.jit(_accumulate_impl)


def _stack3(t):
    return jnp.stack(t, axis=-2)


def _weighted_window_sums_impl(buckets, c: int):
    """Bucket sums (W, B, 3, 24) (slot b holds bucket magnitude b+1) ->
    per-window weighted sums sum_b (b+1)*B_b as (W, 3, 24).

    Two-level decomposition b = g*K + k:
      S_w = K * sum_g g*A_g + sum_g T_g,
      A_g = sum_k B_{g,k},  T_g = sum_k (k+1) B_{g,k},
    each level a high-to-low running-sum scan (the classic Pippenger
    suffix trick), depth K + G + log2(K) instead of B.

    Small windows (B <= 16, i.e. c <= 5 — the mesh dryrun and the
    narrow-bits CPU tests) take a single-level suffix scan instead:
    same math, but 2 EC-add instances in the trace instead of 7 —
    and XLA compile time on this box is ~17-25 s PER add instance
    (CLAUDE.md rule 2), so the two-level form was ~100 s of pure
    compile for an 8-bucket problem (VERDICT r4 task 1)."""
    W, B = buckets.shape[:2]
    if B <= 16:
        xs = jnp.flip(jnp.moveaxis(buckets, 1, 0), 0)  # (B, W, 3, 24)

        def lvl(carry, x):
            run, tot = carry
            run = _stack3(dg1.add(_as_tuple(run), _as_tuple(x)))
            tot = _stack3(dg1.add(_as_tuple(tot), _as_tuple(run)))
            return (run, tot), None

        zero_w = _stack3(dg1.identity((W,)))
        (_, tot), _ = jax.lax.scan(lvl, (zero_w, zero_w), xs)
        return tot
    K = 1 << ((c - 1 + 1) // 2)
    K = min(K, B)
    G = B // K
    assert G * K == B
    bk = buckets.reshape(W, G, K, 3, 24)
    # level 1: scan k = K-1 .. 0
    xs = jnp.flip(jnp.moveaxis(bk, 2, 0), 0)       # (K, W, G, 3, 24)

    def lvl1(carry, x):
        run, tot = carry
        run = _stack3(dg1.add(_as_tuple(run), _as_tuple(x)))
        tot = _stack3(dg1.add(_as_tuple(tot), _as_tuple(run)))
        return (run, tot), None

    zero_wg = _stack3(dg1.identity((W, G)))
    (a_g, t_g), _ = jax.lax.scan(lvl1, (zero_wg, zero_wg), xs)

    # level 2: scan g = G-1 .. 0 with three accumulators
    xs2 = jnp.flip(jnp.moveaxis(jnp.stack([a_g, t_g]), 2, 0), 0)

    def lvl2(carry, x):
        run2, tot2, sum_t = carry
        a, t = x[0], x[1]
        run2 = _stack3(dg1.add(_as_tuple(run2), _as_tuple(a)))
        tot2 = _stack3(dg1.add(_as_tuple(tot2), _as_tuple(run2)))
        sum_t = _stack3(dg1.add(_as_tuple(sum_t), _as_tuple(t)))
        return (run2, tot2, sum_t), None

    zero_w = _stack3(dg1.identity((W,)))
    (run2, tot2, sum_t), _ = jax.lax.scan(
        lvl2, (zero_w, zero_w, zero_w), xs2)

    # sum_g g*A_g = tot2 - run2; S = K*(that) + sum_t
    gpart = _stack3(dev_sub_point(tot2, run2))
    gpart = jax.lax.fori_loop(
        0, K.bit_length() - 1,
        lambda _, p: _stack3(dg1.add(_as_tuple(p), _as_tuple(p))), gpart)
    return _stack3(dg1.add(_as_tuple(gpart), _as_tuple(sum_t)))


_weighted_window_sums = jax.jit(_weighted_window_sums_impl,
                                static_argnames=("c",))


def dev_sub_point(p, q):
    """p - q on stacked (..., 3, 24) projective points."""
    qx, qy, qz = _as_tuple(q)
    return dg1.add(_as_tuple(p), (qx, dev.neg_mod(qy, FP), qz))


def window_sums_impl(points_packed, l1, l2, c: int):
    """Traceable pipeline body: chunked CSR -> (W, 3, 24) weighted
    window sums.  Pass 1 reduces each level-1 chunk row; pass 2 merges
    row sums into buckets (same kernel, rows as points); then the
    weighted scan.  Used inside shard_map by dist/msm_sharded.py."""
    row_sums = _accumulate_impl(points_packed, l1)
    row_pts = jnp.concatenate(
        [_stack3(dg1.identity((1,))), row_sums], axis=0)
    W, B, M2 = l2.shape
    buckets = _accumulate_impl(row_pts, l2.reshape(W * B, M2))
    return _weighted_window_sums_impl(buckets.reshape(W, B, 3, 24), c)


_affine_ok = None          # WeakSet of tables validated affine
_affine_bad = None         # WeakSet of tables known NON-affine


def _table_is_affine(points_packed) -> bool:
    """One-time (per table object) check of window_sums_fused's
    precondition: rows 1.. must be AFFINE (z == one_mont) — the kernel
    reconstructs z and would silently compute garbage for an identity
    (z == 0) row.  Costs one device reduction + sync per table
    lifetime, not per commit (committers reuse their packed array).
    Verdicts (both signs) are memoized so a projective table routed to
    the per-step fallback doesn't re-pay the reduction each commit."""
    global _affine_ok, _affine_bad
    import weakref
    if _affine_ok is None:
        _affine_ok = weakref.WeakSet()
        _affine_bad = weakref.WeakSet()
    try:
        if points_packed in _affine_ok:
            return True
        if points_packed in _affine_bad:
            return False
    except TypeError:                      # non-weakref-able input
        pass
    one = dg1.identity(())[1]
    ok = points_packed.shape[0] <= 1 or bool(
        jnp.all(points_packed[1:, 2, :] == one[None]))
    try:
        (_affine_ok if ok else _affine_bad).add(points_packed)
    except TypeError:
        pass
    return ok


def _check_affine(points_packed):
    if not _table_is_affine(points_packed):
        raise ValueError(
            "window_sums_fused: point table rows 1.. must be affine "
            "(z == 1); identity/projective rows are only legal at "
            "row 0 — batch-normalize the table first "
            "(pcs.srs_device._normalize_packed)")


_tbl_cache = []    # [(weakref(points_packed), tbl)], small FIFO


def _fused_tbl(points_packed):
    """The fused kernel's (48, N) transposed x|y table, cached per
    point-table object: rebuilding it per commit churned a ~200 MB
    contiguous allocation 11+ times per proof, feeding the tunnel
    worker's allocator fragmentation (prove20_r3* RESOURCE_EXHAUSTED
    saga)."""
    import weakref
    for ref, tbl in _tbl_cache:
        if ref() is points_packed:
            return tbl
    tbl = jnp.concatenate(
        [points_packed[:, 0, :].T, points_packed[:, 1, :].T], axis=0)
    try:
        _tbl_cache.append((weakref.ref(points_packed), tbl))
    except TypeError:
        return tbl
    while len(_tbl_cache) > 4 or any(
            r() is None for r, _ in _tbl_cache):
        _tbl_cache[:] = [(r, t) for r, t in _tbl_cache
                         if r() is not None][-4:]
        break
    return tbl


def window_sums_fused(points_packed, l1, l2, c: int, interpret=False):
    """window_sums via the fused CSR-accumulate kernel
    (curves/pallas_g1.accumulate_csr): the whole list walk of each pass
    runs as ONE pallas_call with the accumulator VMEM-resident across
    chunk steps, instead of one gather + transpose + kernel launch per
    list step.  Pass 1 gathers only (x, y) — the SRS table is affine by
    construction (pack_points sets z = R on every non-identity row) —
    and synthesizes z in-kernel.  The affine precondition is enforced
    once per table object (_check_affine).  Bit-identical to the
    per-step paths (tests/test_msm_device.py)."""
    from ..curves import pallas_g1 as plg
    _check_affine(points_packed)
    tbl = _fused_tbl(points_packed)
    rx, ry, rz = plg.accumulate_csr(tbl, l1, affine=True,
                                    interpret=interpret)
    ix, iy, iz = dg1.identity(())
    tbl2 = jnp.concatenate([
        jnp.concatenate([ix[:, None], rx], axis=1),
        jnp.concatenate([iy[:, None], ry], axis=1),
        jnp.concatenate([iz[:, None], rz], axis=1)], axis=0)
    W, B, M2 = l2.shape
    bx, by, bz = plg.accumulate_csr(tbl2, jnp.asarray(l2).reshape(W * B, M2),
                                    affine=False, interpret=interpret)
    buckets = jnp.transpose(jnp.stack([bx, by, bz]),
                            (2, 0, 1)).reshape(W, B, 3, 24)
    if interpret or jax.default_backend() in ("cpu",):
        return _weighted_window_sums(buckets, c)
    return _weighted_window_sums_pl(buckets, c)


def window_sums(points_packed, l1, l2, c: int, use_pallas=None,
                use_fused=None):
    """Single-chip pipeline (jitted stages; see window_sums_impl).
    On a real TPU the accumulate passes run through the fused Pallas
    point-add kernel (curves/pallas_g1) — one kernel per list step with
    every Fp intermediate in VMEM; the jnp path remains for CPU meshes
    and shard_map tracing and is bit-identical (asserted in tests).
    The whole-list-walk kernel (window_sums_fused — one pallas_call per
    CSR pass, accumulator VMEM-resident across steps) is the DEFAULT on
    TPU since it measured 353k pts/s @ 2^18 c=13 vs 206k for the
    per-step path (bench_results/msm_sweep.json, v5e);
    TPU_PLONK_MSM_FUSED=0 restores the per-step path."""
    if use_fused is None:
        use_fused = (_os.environ.get("TPU_PLONK_MSM_FUSED", "1")
                     not in ("", "0")
                     and jax.default_backend() not in ("cpu",)
                     # projective tables (e.g. hand-built) fall back to
                     # the per-step path, which accepts any
                     # representative, instead of raising (ADVICE r2)
                     and _table_is_affine(points_packed))
    if use_fused:
        return window_sums_fused(points_packed, jnp.asarray(l1), l2, c)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        row_sums = _accumulate_pl(points_packed, jnp.asarray(l1))
        row_pts = jnp.concatenate(
            [_stack3(dg1.identity((1,))), row_sums], axis=0)
        W, B, M2 = l2.shape
        buckets = _accumulate_pl(row_pts,
                                 jnp.asarray(l2).reshape(W * B, M2))
        return _weighted_window_sums_pl(buckets.reshape(W, B, 3, 24), c)
    row_sums = _accumulate(points_packed, jnp.asarray(l1))
    row_pts = jnp.concatenate(
        [_stack3(dg1.identity((1,))), row_sums], axis=0)
    W, B, M2 = l2.shape
    buckets = _accumulate(row_pts, jnp.asarray(l2).reshape(W * B, M2))
    return _weighted_window_sums(buckets.reshape(W, B, 3, 24), c)


# ---------------------------------------------------------------------------
# Pallas-backed accumulate (real TPU): transposed (3, 24, B) state, the
# fused complete-add kernel, signs folded into the kernel
# ---------------------------------------------------------------------------

def _accumulate_pl_impl(points, idx):
    """Same contract as _accumulate_impl, but the point state rides in
    transposed (3, 24, R) layout and each list step is one fused Pallas
    add (gather + one transpose per step are the only XLA ops)."""
    from ..curves import pallas_g1

    R = idx.shape[0]

    def body(m, acc):
        e = jax.lax.dynamic_index_in_dim(idx, m, axis=1, keepdims=False)
        rows = jnp.abs(e)
        g = jnp.take(points, rows, axis=0)          # (R, 3, 24)
        gt = jnp.transpose(g, (1, 2, 0))            # (3, 24, R)
        rx, ry, rz = pallas_g1.add_t(
            (acc[0], acc[1], acc[2]), (gt[0], gt[1], gt[2]),
            sign=(e < 0))
        return jnp.stack([rx, ry, rz])

    ix, iy, iz = dg1.identity(())
    acc0 = jnp.stack([
        jnp.broadcast_to(ix[:, None], (24, R)),
        jnp.broadcast_to(iy[:, None], (24, R)),
        jnp.broadcast_to(iz[:, None], (24, R))])
    out = jax.lax.fori_loop(0, idx.shape[1], body, acc0)
    return jnp.transpose(out, (2, 0, 1))            # (R, 3, 24)


_accumulate_pl = jax.jit(_accumulate_pl_impl)


def _weighted_window_sums_pl_impl(buckets, c: int):
    """_weighted_window_sums_impl with the scan-step adds routed
    through the fused Pallas kernel (transposed state)."""
    from ..curves import pallas_g1

    def padd(p, q):
        return jnp.stack(pallas_g1.add_t(
            (p[0], p[1], p[2]), (q[0], q[1], q[2])))

    def psub(p, q):
        ny = dev.neg_mod(jnp.moveaxis(q[1], 0, -1), FP)
        return jnp.stack(pallas_g1.add_t(
            (p[0], p[1], p[2]),
            (q[0], jnp.moveaxis(ny, -1, 0), q[2])))

    W, B = buckets.shape[:2]
    K = 1 << ((c - 1 + 1) // 2)
    K = min(K, B)
    G = B // K
    assert G * K == B
    # (W, G, K, 3, 24) -> (K, 3, 24, W*G) transposed scan stream
    bk = buckets.reshape(W, G, K, 3, 24)
    xs = jnp.flip(jnp.transpose(bk, (2, 3, 4, 0, 1))
                  .reshape(K, 3, 24, W * G), 0)

    def lvl1(carry, x):
        run, tot = carry
        run = padd(run, x)
        tot = padd(tot, run)
        return (run, tot), None

    ix, iy, iz = dg1.identity(())
    zero_wg = jnp.stack([
        jnp.broadcast_to(co[:, None], (24, W * G)) for co in (ix, iy, iz)])
    (a_g, t_g), _ = jax.lax.scan(lvl1, (zero_wg, zero_wg), xs)

    # (3, 24, W*G) -> (G, 2, 3, 24, W) scan stream, highest g first
    def regroup(v):
        return jnp.transpose(v.reshape(3, 24, W, G), (3, 0, 1, 2))
    xs2 = jnp.flip(jnp.stack([regroup(a_g), regroup(t_g)], axis=1), 0)

    def lvl2(carry, x):
        run2, tot2, sum_t = carry
        run2 = padd(run2, x[0])
        tot2 = padd(tot2, run2)
        sum_t = padd(sum_t, x[1])
        return (run2, tot2, sum_t), None

    zero_w = jnp.stack([
        jnp.broadcast_to(co[:, None], (24, W)) for co in (ix, iy, iz)])
    (run2, tot2, sum_t), _ = jax.lax.scan(
        lvl2, (zero_w, zero_w, zero_w), xs2)

    gpart = psub(tot2, run2)
    gpart = jax.lax.fori_loop(
        0, K.bit_length() - 1, lambda _, p: padd(p, p), gpart)
    out = padd(gpart, sum_t)                        # (3, 24, W)
    return jnp.transpose(out, (2, 0, 1))            # (W, 3, 24)


_weighted_window_sums_pl = jax.jit(_weighted_window_sums_pl_impl,
                                   static_argnames=("c",))


# ---------------------------------------------------------------------------
# host fold + public API
# ---------------------------------------------------------------------------

def fold_windows_host(window_pts, c: int):
    """Horner fold of per-window affine sums on the host: O(W*c) jacobian
    ops on ~27 points — cheaper and compile-free vs a device scan tail."""
    acc = None
    for p in reversed(window_pts):
        if acc is not None:
            for _ in range(c):
                acc = g1.add(acc, acc)
        acc = g1.add(acc, p) if acc is not None else p
    return acc


def sums_to_host(sums) -> list:
    """(W, 3, 24) device sums -> list of affine host points."""
    return dg1.points_from_device(_as_tuple(sums))


def commit_many_packed(points_packed, coeffs_list, c: int,
                       n_windows: int, max_len: int,
                       prefetch_cb=None):
    """Pipelined multi-commit (the within-round overlap of SURVEY §2.10
    "Round pipeline"): all Montgomery->canonical conversions are
    dispatched and pulled first, then each CSR build (host, ~0.3-1.3 s
    at 2^16-2^20) runs WHILE the device crunches the previous
    polynomial's window sums — the device queue stays full instead of
    idling behind the host builder.  Transcript-legal because
    commitments inside one prover round are all appended before the
    next challenge is squeezed.

    prefetch_cb (VERDICT r2 #9 cross-round pipelining): called after
    the canonical conversions are dispatched but before the blocking
    host pulls — the callback may enqueue challenge-independent device
    work for LATER rounds (e.g. wire/PI quotient-phase NTTs), which
    then executes in the device-idle window behind the host CSR
    builds."""
    canons = []
    for cf in coeffs_list:
        n = cf.shape[0]
        if n > max_len:
            raise ValueError("polynomial exceeds committed SRS")
        canons.append((dev.from_mont(cf, dev.FR), n))
    if prefetch_cb is not None:
        prefetch_cb()
    padded = [np.pad(np.asarray(cn), ((0, max_len - n), (0, 0)))
              for cn, n in canons]
    sums = []
    for cn in padded:
        l1, l2 = csr_from_limbs(cn, c, n_windows)
        sums.append(window_sums(points_packed, jax.device_put(l1),
                                jax.device_put(l2), c))
    # ONE device->host pull for all polynomials' window sums: each
    # per-poly sums_to_host costs a tunnel round-trip; convert from
    # Montgomery on device, pull the stacked (P, W, 3, 24) once, and
    # normalize projective -> affine purely on host
    canon = np.asarray(dev.from_mont(jnp.stack(sums), FP))
    return [fold_windows_host(_canon_sums_to_host(s), c) for s in canon]


def _canon_sums_to_host(s: np.ndarray) -> list:
    """(W, 3, 24) CANONICAL (non-Montgomery) numpy limbs -> affine host
    points (None = identity); host-only math."""
    from ..params import P_MOD
    xs = limbs.limbs_to_ints(s[:, 0])
    ys = limbs.limbs_to_ints(s[:, 1])
    zs = limbs.limbs_to_ints(s[:, 2])
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P_MOD)
            out.append((x * zi % P_MOD, y * zi % P_MOD))
    return out


def msm(points, scalars, c: int = 12, n_windows: int = None):
    """Host-facing MSM: affine points + int scalars -> affine point.
    `n_windows` bounds the unsigned digit count for known-small scalars
    (keeps test compiles cheap); default covers the full 255 bits."""
    pts = pack_points(points)
    l1, l2 = scalars_to_csr(scalars, c, n_windows)
    s = window_sums(pts, l1, l2, c)
    return fold_windows_host(sums_to_host(s), c)
