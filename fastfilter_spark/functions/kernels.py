"""Exact-uint64 scalar kernels, vectorized with numpy.

These reproduce, bit-for-bit, the hash/PRNG/index arithmetic of the
reference C library (FastFilter/xor_singleheader):

- murmur64 finalizer        -> /root/reference/include/xorfilter.h:46-53
- mix_split (seeded hash)   -> /root/reference/include/xorfilter.h:55-57
- rotl64                    -> /root/reference/include/xorfilter.h:59-61
- reduce (Lemire modulo)    -> /root/reference/include/xorfilter.h:63-66
- fingerprint fold          -> /root/reference/include/xorfilter.h:68-70
- splitmix64 PRNG           -> /root/reference/include/xorfilter.h:77-82
- mulhi (64x64 high word)   -> /root/reference/include/binaryfusefilter.h:96-146
                               (portable split-word schoolbook recipe)
- fuse index triple         -> /root/reference/include/binaryfusefilter.h:154-175

All array kernels take/return ``np.uint64`` arrays.  Every constant is an
explicit ``np.uint64``; numpy silently promotes mixed int/uint64 arithmetic
to float64, which would corrupt the hashes, so nothing here may use a bare
Python int inside an expression.  Overflow is intentional two's-complement
wraparound (suppressed warnings).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
MASK64 = 0xFFFFFFFFFFFFFFFF
MASK32 = 0xFFFFFFFF

_MURMUR_C1 = U64(0xFF51AFD7ED558CCD)
_MURMUR_C2 = U64(0xC4CEB9FE1A85EC53)
_SHIFT_33 = U64(33)
_SHIFT_32 = U64(32)
_SHIFT_18 = U64(18)
_SHIFT_36 = U64(36)
_LOW36_MASK = U64((1 << 36) - 1)
_LOW32 = U64(0xFFFFFFFF)

# splitmix64 chain constants (xorfilter.h:77-82)
SPLITMIX_GAMMA = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB

# Seed-retry chain starting counters (xorfilter.h:661; binaryfusefilter.h:286)
XOR_RNG_START = 1
FUSE_RNG_START = 0x726B2B9D438B9D4D

# Retry policy constants (xorfilter.h:10-17)
XOR_SORT_ITERATIONS = 10
XOR_MAX_ITERATIONS = 100


def murmur64(h: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer over a uint64 array (xorfilter.h:46-53)."""
    h = np.asarray(h, dtype=U64)
    with np.errstate(over="ignore"):
        h = h ^ (h >> _SHIFT_33)
        h = h * _MURMUR_C1
        h = h ^ (h >> _SHIFT_33)
        h = h * _MURMUR_C2
        h = h ^ (h >> _SHIFT_33)
    return h


def mix_split(keys: np.ndarray, seed: int) -> np.ndarray:
    """Seeded hash: murmur64(key + seed) (xorfilter.h:55-57)."""
    keys = np.asarray(keys, dtype=U64)
    with np.errstate(over="ignore"):
        return murmur64(keys + U64(seed & MASK64))


def rotl64(h: np.ndarray, c: int) -> np.ndarray:
    """Rotate-left 64 (xorfilter.h:59-61)."""
    h = np.asarray(h, dtype=U64)
    c &= 63
    if c == 0:
        return h
    with np.errstate(over="ignore"):
        return (h << U64(c)) | (h >> U64(64 - c))


def reduce32(hash32: np.ndarray, n: int) -> np.ndarray:
    """Lemire multiplicative range reduction: (h * n) >> 32 (xorfilter.h:63-66).

    ``hash32`` must already be truncated to 32 bits; returns uint64 indices
    in [0, n).
    """
    h = np.asarray(hash32, dtype=U64) & _LOW32
    with np.errstate(over="ignore"):
        return (h * U64(n & MASK32)) >> _SHIFT_32


def fingerprint64(h: np.ndarray) -> np.ndarray:
    """Fold a 64-bit hash to a fingerprint source: h ^ (h >> 32) (xorfilter.h:68-70).

    Caller truncates to the filter's fingerprint width.
    """
    h = np.asarray(h, dtype=U64)
    return h ^ (h >> _SHIFT_32)


def splitmix64(state: int) -> tuple[int, int]:
    """One splitmix64 step (xorfilter.h:77-82).

    Takes and returns Python ints (exact, no numpy) because the seed-retry
    chain runs once per build attempt on the driver/kernel side, never
    per row.  Returns ``(new_state, value)``.
    """
    state = (state + SPLITMIX_GAMMA) & MASK64
    z = state
    z = ((z ^ (z >> 30)) * _SM_C1) & MASK64
    z = ((z ^ (z >> 27)) * _SM_C2) & MASK64
    z = z ^ (z >> 31)
    return state, z


def splitmix64_stream(seed: int, n: int) -> np.ndarray:
    """Vectorized n-step splitmix64 stream from ``seed`` (test-data generator).

    Equivalent to calling :func:`splitmix64` n times; vectorized by noting
    state_i = seed + (i+1)*gamma (mod 2^64).
    """
    with np.errstate(over="ignore"):
        i = np.arange(1, n + 1, dtype=U64)
        z = U64(seed & MASK64) + i * U64(SPLITMIX_GAMMA)
        z = (z ^ (z >> U64(30))) * U64(_SM_C1)
        z = (z ^ (z >> U64(27))) * U64(_SM_C2)
        return z ^ (z >> U64(31))


def mulhi(a: np.ndarray, b: int) -> np.ndarray:
    """High 64 bits of a 64x64->128 multiply (binaryfusefilter.h:96-146).

    numpy has no 128-bit integers, so this is the portable split-word
    schoolbook multiply: a = a1*2^32 + a0, b = b1*2^32 + b0; the middle
    partial sum provably cannot overflow 64 bits.
    """
    a = np.asarray(a, dtype=U64)
    b &= MASK64
    b0 = U64(b & MASK32)
    b1 = U64(b >> 32)
    with np.errstate(over="ignore"):
        a0 = a & _LOW32
        a1 = a >> _SHIFT_32
        p11 = a1 * b1
        p01 = a0 * b1
        p10 = a1 * b0
        p00 = a0 * b0
        middle = p10 + (p00 >> _SHIFT_32) + (p01 & _LOW32)
        return p11 + (middle >> _SHIFT_32) + (p01 >> _SHIFT_32)


def xor_index_triple(hashes: np.ndarray, block_length: int):
    """xor-filter index triple (xorfilter.h:198-210): three block-local
    indices in [0, blockLength) from rotations 0/21/42 of the mixed hash."""
    h0 = reduce32(hashes & _LOW32, block_length)
    h1 = reduce32(rotl64(hashes, 21) & _LOW32, block_length)
    h2 = reduce32(rotl64(hashes, 42) & _LOW32, block_length)
    return h0, h1, h2


def fuse_index_triple(
    hashes: np.ndarray, segment_length: int, segment_length_mask: int,
    segment_count_length: int,
):
    """binary-fuse index triple (binaryfusefilter.h:154-164): h0 from the
    mulhi segment map, h1/h2 in the next two segments with windowed XOR
    offsets taken from hash bits [18:36) and [0:18)."""
    hashes = np.asarray(hashes, dtype=U64)
    sl = U64(segment_length & MASK32)
    mask = U64(segment_length_mask & MASK32)
    with np.errstate(over="ignore"):
        h0 = mulhi(hashes, segment_count_length) & _LOW32
        # the C code adds in uint32 before the XOR offsets (h1 = h0+SL; h2 = h1+SL)
        h1 = ((h0 + sl) & _LOW32) ^ ((hashes >> _SHIFT_18) & mask)
        h2 = ((h0 + sl + sl) & _LOW32) ^ (hashes & mask)
    return h0, h1, h2


def fuse_index_triple_exact(
    hashes: np.ndarray, segment_length: int, segment_length_mask: int,
    segment_count_length: int,
):
    """Same as :func:`fuse_index_triple` but computed exactly like the
    per-slot form binary_fuse8_hash (binaryfusefilter.h:166-175), which the
    peeling loop uses: h_i = mulhi(hash, scl) + i*SL ^ ((hash & 2^36-1) >>
    (36-18i)) & mask.  The batch and per-slot forms agree; kept for tests.
    """
    hashes = np.asarray(hashes, dtype=U64)
    sl = U64(segment_length & MASK64)
    mask = U64(segment_length_mask & MASK64)
    out = []
    with np.errstate(over="ignore"):
        base = mulhi(hashes, segment_count_length)
        hh = hashes & _LOW36_MASK
        for i in range(3):
            h = base + U64(i) * sl
            h = h ^ ((hh >> U64(36 - 18 * i)) & mask)
            out.append(h & _LOW32)
    return tuple(out)


def to_uint64(arr) -> np.ndarray:
    """Coerce an int64/uint64/object array (e.g. from Arrow) to np.uint64
    preserving the two's-complement bit pattern."""
    a = np.asarray(arr)
    if a.dtype == np.uint64:
        return a
    if a.dtype == np.int64:
        return a.view(np.uint64)
    if a.dtype == object:  # Python ints possibly > 2^63
        return np.array([int(x) & MASK64 for x in a], dtype=U64)
    return a.astype(np.int64).view(np.uint64)


def to_int64(arr: np.ndarray) -> np.ndarray:
    """uint64 -> int64 bit-pattern view (for handing back to Spark)."""
    a = np.asarray(arr, dtype=U64)
    return a.view(np.int64)
