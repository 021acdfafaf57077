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
