"""On-demand-compiled native helpers (C via ctypes).

The TPU framework's compute path is JAX/XLA; the host runtime around it
(here: the MSM CSR builder, a counting-sort-shaped pass on the prover's
critical path) is native C, compiled once per machine into
.cache/native/ and loaded with ctypes.  Falls back cleanly (callers
check `csr_lib() is None`) when no C compiler is present.
"""

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_DIR, "..", "..", ".cache", "native")
_lib = None
_tried = False


def _compile(src: str, name: str):
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, name + ".so")
    src_path = os.path.join(_DIR, src)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src_path)):
        cc = os.environ.get("CC", "gcc")
        cmd = [cc, "-O3", "-shared", "-fPIC", "-o", so + ".tmp", src_path]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
    return ctypes.CDLL(so)


def csr_lib():
    """The CSR builder library, or None if compilation failed."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        lib = _compile("csr_builder.c", "csr_builder")
        lib.csr_count.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.csr_count.restype = None
        lib.csr_fill.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.csr_fill.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# --- BLS12-381 host backend (verifier-path MSM + pairing) -------------------

_bls = None
_bls_tried = False


def bls_lib():
    """The native BLS12-381 library, or None if compilation failed or
    TPU_PLONK_NO_NATIVE is set (tests use the env var to force the
    pure-Python oracle paths)."""
    global _bls, _bls_tried
    if os.environ.get("TPU_PLONK_NO_NATIVE"):
        return None
    if _bls_tried:
        return _bls
    _bls_tried = True
    try:
        lib = _compile("bls12_381.c", "bls12_381")
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.b381_g1_msm.argtypes = [ctypes.c_long, u64p, u8p, u64p,
                                    u64p, u8p]
        lib.b381_g1_msm.restype = None
        lib.b381_pairing_product.argtypes = [ctypes.c_long, u64p, u8p,
                                             u64p, u8p, u64p]
        lib.b381_pairing_product.restype = ctypes.c_int
        lib.b381_keccakf.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
        lib.b381_keccakf.restype = None
        _bls = lib
    except Exception:
        _bls = None
    return _bls


def _int_to_u64s(x: int, n: int, out: np.ndarray):
    for i in range(n):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64


def _u64s_to_int(a) -> int:
    v = 0
    for i in range(len(a) - 1, -1, -1):
        v = (v << 64) | int(a[i])
    return v


def msm_small_native(pairs):
    """sum s_i * P_i over affine-or-None host points.  Returns the
    affine (x, y) tuple, None for the identity result, or the string
    "unavailable" when the native library is absent (callers fall back
    to the Python oracle — None is a VALID result, so it cannot be the
    sentinel)."""
    lib = bls_lib()
    if lib is None:
        return "unavailable"
    from ..params import R_MOD
    live = [(p, s % R_MOD) for p, s in pairs
            if p is not None and s % R_MOD != 0]
    if not live:
        return None
    n = len(live)
    pts = np.zeros(n * 12, dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    scal = np.zeros(n * 4, dtype=np.uint64)
    for i, (p, s) in enumerate(live):
        _int_to_u64s(p[0], 6, pts[i * 12:i * 12 + 6])
        _int_to_u64s(p[1], 6, pts[i * 12 + 6:i * 12 + 12])
        _int_to_u64s(s, 4, scal[i * 4:i * 4 + 4])
    out = np.zeros(12, dtype=np.uint64)
    out_inf = np.zeros(1, dtype=np.uint8)
    lib.b381_g1_msm(n, _ptr(pts, ctypes.c_uint64),
                    _ptr(inf, ctypes.c_uint8),
                    _ptr(scal, ctypes.c_uint64),
                    _ptr(out, ctypes.c_uint64),
                    _ptr(out_inf, ctypes.c_uint8))
    if out_inf[0]:
        return None
    return (_u64s_to_int(out[:6]), _u64s_to_int(out[6:]))


def pairing_product_native(pairs):
    """prod e(P_i, Q_i) final-exponentiated.  Returns (is_one, f12)
    where f12 is the nested-tuple Fp12 element matching fields/fp.py's
    representation, or None when the native library is absent."""
    lib = bls_lib()
    if lib is None:
        return None
    n = len(pairs)
    g1p = np.zeros(max(n, 1) * 12, dtype=np.uint64)
    g1i = np.ones(max(n, 1), dtype=np.uint8)
    g2p = np.zeros(max(n, 1) * 24, dtype=np.uint64)
    g2i = np.ones(max(n, 1), dtype=np.uint8)
    for i, (p, q) in enumerate(pairs):
        if p is None or q is None:
            continue
        g1i[i] = 0
        g2i[i] = 0
        _int_to_u64s(p[0], 6, g1p[i * 12:i * 12 + 6])
        _int_to_u64s(p[1], 6, g1p[i * 12 + 6:i * 12 + 12])
        (x0, x1), (y0, y1) = q
        _int_to_u64s(x0, 6, g2p[i * 24:i * 24 + 6])
        _int_to_u64s(x1, 6, g2p[i * 24 + 6:i * 24 + 12])
        _int_to_u64s(y0, 6, g2p[i * 24 + 12:i * 24 + 18])
        _int_to_u64s(y1, 6, g2p[i * 24 + 18:i * 24 + 24])
    out = np.zeros(72, dtype=np.uint64)
    ok = lib.b381_pairing_product(n, _ptr(g1p, ctypes.c_uint64),
                                  _ptr(g1i, ctypes.c_uint8),
                                  _ptr(g2p, ctypes.c_uint64),
                                  _ptr(g2i, ctypes.c_uint8),
                                  _ptr(out, ctypes.c_uint64))
    cs = [_u64s_to_int(out[i * 6:(i + 1) * 6]) for i in range(12)]
    f12 = (((cs[0], cs[1]), (cs[2], cs[3]), (cs[4], cs[5])),
           ((cs[6], cs[7]), (cs[8], cs[9]), (cs[10], cs[11])))
    return bool(ok), f12


def build_csr_native(canon: np.ndarray, c: int, n_windows: int,
                     chunk: int, pad_rows: int = 256, pad_m2: int = 16):
    """C two-pass CSR build from canonical 16-bit limbs.  Returns
    (l1, l2) with the same layout as msm_csr.build_csr, or None when
    the native library is unavailable."""
    lib = csr_lib()
    if lib is None:
        return None
    canon = np.ascontiguousarray(canon, dtype=np.uint32)
    n, n_limbs = canon.shape
    B = 1 << (c - 1)
    stride = B + 1
    counts = np.zeros(n_windows * stride, dtype=np.int64)
    lib.csr_count(_ptr(canon, ctypes.c_uint32), n, n_limbs, c, n_windows,
                  _ptr(counts, ctypes.c_int64))
    counts2 = counts.reshape(n_windows, stride)
    nz = counts2[:, 1:]                       # (W, B) bucket loads
    nrows = -(-nz // chunk)
    flat_rows = nrows.ravel()
    row_start = np.cumsum(flat_rows) - flat_rows
    row_start = row_start.reshape(n_windows, B)
    r_total = int(flat_rows.sum())
    R = max(pad_rows, -(-r_total // pad_rows) * pad_rows)
    m2_max = int(nrows.max()) if r_total else 0
    M2 = max(pad_m2, -(-m2_max // pad_m2) * pad_m2)

    l1 = np.zeros(R * chunk, dtype=np.int32)
    cursor = np.zeros(n_windows * stride, dtype=np.int64)
    cursor.reshape(n_windows, stride)[:, 1:] = row_start * chunk
    lib.csr_fill(_ptr(canon, ctypes.c_uint32), n, n_limbs, c, n_windows,
                 _ptr(cursor, ctypes.c_int64), chunk,
                 _ptr(l1, ctypes.c_int32))

    l2 = np.zeros((n_windows, B, M2), dtype=np.int32)
    k = np.arange(M2)[None, None, :]
    l2[:] = np.where(k < nrows[:, :, None],
                     row_start[:, :, None] + 1 + k, 0)
    return l1.reshape(R, chunk), l2
