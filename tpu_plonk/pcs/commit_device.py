"""KZG commitments on the TPU: SRS G1 powers resident on device,
polynomial coefficients arrive as Montgomery limb arrays straight from
the device prover engine; the host builds the chunked-CSR digit lists
(pcs/msm_csr.py) and only the 48-byte commitment leaves for the
transcript (SURVEY.md §3.2 "commit" hot spots)."""

import numpy as np

from ..fields import device as dev
from . import msm_csr


class DeviceCommitter:
    """Bind a trimmed SRS to the device once; `commit` maps Montgomery
    coefficient arrays to affine G1 commitments.  Window width c is
    fixed per committer so every commit in a proof reuses one compiled
    MSM pipeline (shape-stable CSR via pad_windows + fixed point count).
    """

    def __init__(self, srs, max_len: int, c: int = 12):
        if max_len > len(srs.powers_g1):
            raise ValueError("SRS too small for committed length")
        self.c = c
        self.points = msm_csr.pack_points(srs.powers_g1[:max_len])
        self.max_len = max_len
        self.n_windows = msm_csr.signed_window_count(c)

    def commit(self, coeffs_mont):
        n = coeffs_mont.shape[0]
        if n > self.max_len:
            raise ValueError("polynomial exceeds committed SRS")
        canon = np.asarray(dev.from_mont(coeffs_mont, dev.FR))
        # zero-pad to the committed length: zero digits vanish from the
        # CSR lists, and a single point-array shape means every commit
        # in a proof reuses one compiled MSM
        canon = np.pad(canon, ((0, self.max_len - n), (0, 0)))
        l1, l2 = msm_csr.csr_from_limbs(canon, self.c, self.n_windows)
        s = msm_csr.window_sums(self.points, l1, l2, self.c)
        return msm_csr.fold_windows_host(msm_csr.sums_to_host(s), self.c)

    def commit_many(self, coeffs_list, prefetch_cb=None):
        """Pipelined batch commit (host CSR build overlapped with the
        device MSM of the previous polynomial); prefetch_cb may enqueue
        later-round device work into the idle window (msm_csr
        docstring)."""
        return msm_csr.commit_many_packed(
            self.points, coeffs_list, self.c, self.n_windows,
            self.max_len, prefetch_cb=prefetch_cb)
