"""Keccak-f[1600] permutation (pure Python, host-side).

The transcript is O(#commitments) per proof — a few dozen permutation
calls — so a clear host implementation is the right design point
(SURVEY.md §2.8: "transcript runs on host CPU").
State is 200 bytes = 25 little-endian u64 lanes.
"""

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & _MASK


def f1600_lanes(lanes):
    """Permute a 5x5 lane matrix (lanes[x][y], ints)."""
    a = lanes
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROTATIONS[x][y])
        # chi
        a = [[b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _MASK)
              for y in range(5)] for x in range(5)]
        # iota
        a[0][0] ^= rc
    return a


def f1600(state: bytearray) -> None:
    """In-place permutation of a 200-byte state (LE u64 lanes, x-major
    index lane[i] = lanes[i % 5][i // 5]).  Routed through the native
    library when available (byte-equality with the Python rounds below
    is asserted in tests/test_native_bls.py)."""
    from .. import native
    lib = native.bls_lib()
    if lib is not None:
        import ctypes
        buf = (ctypes.c_uint64 * 25).from_buffer(state)
        lib.b381_keccakf(buf)
        return
    lanes = [[int.from_bytes(state[8 * (x + 5 * y): 8 * (x + 5 * y) + 8],
                             "little") for y in range(5)] for x in range(5)]
    lanes = f1600_lanes(lanes)
    for x in range(5):
        for y in range(5):
            state[8 * (x + 5 * y): 8 * (x + 5 * y) + 8] = \
                lanes[x][y].to_bytes(8, "little")
