/* Native CSR builder for the chunked-CSR TPU MSM (pcs/msm_csr.py).
 *
 * The host-side prep for every KZG commit — per-window signed-digit
 * recoding of each scalar plus counting-sort of point indices into
 * per-(window,bucket) chunk rows — is a pure pointer-chasing pass that
 * numpy needs several vectorized sweeps (and ~4 s at 2^18) to express.
 * This C pass does it in two linear scans (count, fill), ~50 ms at
 * 2^18, keeping the host prep off the prover's critical path.
 *
 * Layout contract (must match msm_csr.build_csr):
 *   - scalars arrive as (N, 16) little-endian 16-bit limbs in uint32
 *   - windows: W signed base-2^c digits, balanced recoding with carry
 *     iff digit > 2^(c-1)  (magnitudes 1..2^(c-1); zero dropped)
 *   - level-1: rows of `chunk` entries, one (window,bucket) per row,
 *     entries +-(point_index+1), 0 padding
 *   - level-2 is assembled in numpy from the returned counts (cheap).
 *
 * Compiled on demand by tpu_plonk/native/__init__.py (gcc -O3 -shared);
 * msm_csr falls back to the numpy path when no compiler is available.
 */

#include <stdint.h>
#include <string.h>

/* Count pass: per-(window,bucket) magnitudes.
 * counts: zero-initialised array of W * (half+1) int64.
 * Returns nothing; counts[w*(half+1) + mag]++ for every digit. */
void csr_count(const uint32_t *limbs, long n, int n_limbs, int c, int w_cnt,
               int64_t *counts)
{
    const int half = 1 << (c - 1);
    const int full = 1 << c;
    const int stride = half + 1;
    for (long i = 0; i < n; i++) {
        const uint32_t *row = limbs + i * n_limbs;
        int carry = 0;
        for (int w = 0; w < w_cnt; w++) {
            long bit = (long)w * c;
            int li = (int)(bit >> 4), sh = (int)(bit & 15);
            uint32_t lo = row[li] >> sh;
            uint32_t hi = (sh && li + 1 < n_limbs) ? (row[li + 1] << (16 - sh))
                                                   : 0;
            int d = (int)((lo | hi) & (full - 1)) + carry;
            carry = d > half;
            if (carry)
                d -= full;
            int mag = d < 0 ? -d : d;
            counts[(long)w * stride + mag]++;
        }
    }
}

/* Fill pass: starts[w*stride + mag] must hold the GLOBAL flat slot
 * (row_start_of_bucket * chunk rounded layout handled by caller:
 * here starts is the running write cursor in "bucket-local slot"
 * space, i.e. caller passes row_start[w][mag]*chunk).  l1 is the
 * zeroed (R, chunk) int32 level-1 array, flattened. */
void csr_fill(const uint32_t *limbs, long n, int n_limbs, int c, int w_cnt,
              int64_t *cursor, int chunk, int32_t *l1)
{
    const int half = 1 << (c - 1);
    const int full = 1 << c;
    const int stride = half + 1;
    (void)chunk;
    for (long i = 0; i < n; i++) {
        const uint32_t *row = limbs + i * n_limbs;
        int carry = 0;
        for (int w = 0; w < w_cnt; w++) {
            long bit = (long)w * c;
            int li = (int)(bit >> 4), sh = (int)(bit & 15);
            uint32_t lo = row[li] >> sh;
            uint32_t hi = (sh && li + 1 < n_limbs) ? (row[li + 1] << (16 - sh))
                                                   : 0;
            int d = (int)((lo | hi) & (full - 1)) + carry;
            carry = d > half;
            if (carry)
                d -= full;
            if (d == 0)
                continue;
            int neg = d < 0;
            int mag = neg ? -d : d;
            long slot = cursor[(long)w * stride + mag]++;
            l1[slot] = neg ? -(int32_t)(i + 1) : (int32_t)(i + 1);
        }
    }
}
