"""Port of the reference's tests/unit.c lifecycle (build -> zero false
negatives -> serialize/deserialize round-trip -> fpp estimate -> bits/entry)
plus seed-chain parity constants captured from the compiled reference.

Oracle facts (reference C built over the same deterministic inputs):
- contiguous keys 0..n-1 for n in {1000, 10000, 300000}: every filter type
  succeeds on the FIRST seed — xor8/xor16 seed 0x910a2dec89025cc1
  (= splitmix64 chain from counter 1, first value), fuse8/fuse16 seed
  0x6df6b22537d23467 (= chain from 0x726b2b9d438b9d4d, first value).
- 100000 splitmix64(4242) probes (members excluded): fp counts
  xor8=384, fuse8=369 (n=1000) -> fpp ~ 2^-8; xor16<=1, fuse16<=3 -> ~2^-16.
- edge sizes 0/1/2: fuse populate succeeds on the first seed.
- duplicate pattern (n=1000, last 10 keys repeat 0..9): the reference's
  inline duplicate detection is insertion-order-dependent and can miss
  duplicates that share a cell with a third key, so the C library retried
  (fuse8 succeeded on seed #2, xor8 deduped at attempt 10 and succeeded
  later).  Our kernel detects all duplicates exactly (the seeded hash is a
  bijection) and is partition-order invariant — required by BASELINE.md —
  so it may succeed on an *earlier* seed of the same chain; never later.
"""

import numpy as np
import pytest

from fastfilter_spark.functions import kernels as K
from fastfilter_spark.operators import local as L

XOR_FIRST_SEED = 0x910A2DEC89025CC1
FUSE_FIRST_SEED = 0x6DF6B22537D23467

ALL_KINDS = ["xor8", "xor16", "fuse8", "fuse16", "fuse32"]
FPP_BOUND = {"xor8": 2**-8, "xor16": 2**-16, "fuse8": 2**-8,
             "fuse16": 2**-16, "fuse32": 2**-32}
# bits-per-entry targets: ~9.84 for xor8, ~9.0 for fuse8 at large n
# (BASELINE.json:north_star; xorfilter.h:135; README.md:166-169)


def contiguous(n, repeated=0):
    keys = np.arange(n, dtype=np.uint64)
    if repeated:
        keys[n - repeated:] = np.arange(repeated, dtype=np.uint64)[::-1]
    return keys


def probes_nonmember(n_keys, trials=100000):
    p = K.splitmix64_stream(4242, trials)
    return p[p >= n_keys]


@pytest.mark.parametrize("kind", ALL_KINDS)
@pytest.mark.parametrize("n", [1000, 10000])
def test_lifecycle(kind, n):
    keys = contiguous(n)
    f = L.build_filter(keys, kind)

    # first-seed success parity with the reference C library
    if kind.startswith("xor"):
        assert f.seed == XOR_FIRST_SEED
    else:
        assert f.seed == FUSE_FIRST_SEED

    # zero false negatives (tests/unit.c:58-63)
    assert bool(f.contain(keys).all())

    # serialize round-trip preserves behavior (tests/unit.c:65-76)
    g = L.filter_from_bytes(f.to_bytes(), kind)
    assert bool(g.contain(keys).all())
    assert g.to_bytes() == f.to_bytes()

    # fpp estimate (tests/unit.c:78-89); 3 sigma sampling tolerance
    probes = probes_nonmember(n)
    fpp = f.contain(probes).mean()
    bound = FPP_BOUND[kind]
    sigma = (bound * (1 - bound) / probes.size) ** 0.5
    assert fpp <= bound + 4 * sigma, (kind, n, fpp)

    # bits per entry (tests/unit.c:90-97)
    bpe = f.size_in_bytes() * 8.0 / n
    if kind == "xor8" and n >= 10000:
        assert abs(bpe - 9.84) / 9.84 < 0.02
    if kind == "fuse8" and n >= 10000:
        assert bpe < 11.0  # ~9.0 at 1M keys; small n has overhead


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_partition_order_invariance(kind):
    """Identical filter bytes regardless of key order (BASELINE.md)."""
    keys = contiguous(5000)
    f1 = L.build_filter(keys, kind)
    rng = np.random.default_rng(99)
    f2 = L.build_filter(rng.permutation(keys), kind)
    assert f1.to_bytes() == f2.to_bytes()


@pytest.mark.parametrize("kind", ["fuse8", "fuse16", "xor8"])
def test_duplicate_tolerance(kind):
    """10 duplicated keys still build and contain (tests/unit.c:369-372).
    Our dedup-on-detection is exact, so success is no later than the C
    library's (which needed seed #2 for fuse8 and attempt >=10 for xor8)."""
    keys = contiguous(1000, repeated=10)
    f = L.build_filter(keys, kind)
    assert bool(f.contain(keys).all())
    if kind == "fuse8":
        assert f.seed == FUSE_FIRST_SEED  # exact detection -> first seed


def test_fuse_edge_sizes():
    """Sizes 0, 1, 2 (tests/unit.c:389-394); the C library succeeds on the
    first seed for all three."""
    for n in range(3):
        keys = contiguous(n)
        f = L.FuseFilter.build(keys, 8)
        assert f.seed == FUSE_FIRST_SEED
        assert f.array_length == 12  # degenerate layout, FUSE_LAYOUT golden
        if n:
            assert bool(f.contain(keys).all())


def test_xor_size_zero_fails():
    """xor8_populate returns false for size 0 (xorfilter.h:660)."""
    with pytest.raises(L.ConstructionError):
        L.XorFilter.build(np.array([], dtype=np.uint64), 8)


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_pack_unpack(kind):
    keys = contiguous(2000)
    f = L.build_filter(keys, kind)
    packed = f.pack()
    assert len(packed) < len(f.to_bytes())  # zeros elided
    if kind.startswith("xor"):
        g = L.XorFilter.unpack(packed, f.fingerprint_bits)
    else:
        g = L.FuseFilter.unpack(packed, f.fingerprint_bits)
    assert g.to_bytes() == f.to_bytes()


def test_serialized_size_field():
    """Size field survives serialization even after dedup retries
    (tests/unit.c:196-221): Size = requested size at allocation."""
    keys = contiguous(1000, repeated=10)
    f = L.FuseFilter.build(keys, 8)
    assert f.size == 1000
    g = L.FuseFilter.from_bytes(f.to_bytes(), 8)
    assert g.size == 1000


def test_failure_rate_random_keys():
    """1001-trials analog of tests/unit.c:307-328 at reduced scale: random
    5000-key sets must always build (expected 0 failures).  Run 60 trials
    here; the distributed tests exercise many more shard builds."""
    for trial in range(60):
        keys = K.splitmix64_stream((42 << 20) + trial, 5000)
        f = L.FuseFilter.build(keys, 16)
        assert bool(f.contain(keys).all())


def test_fuse_layout_goldens():
    from tests.golden_vectors import FUSE_LAYOUT, XOR_LAYOUT
    for size, (sl, mask, sc, scl, al) in FUSE_LAYOUT.items():
        got = L.fuse_layout(size)
        assert got == (sl, sc, scl, al), size
        assert sl - 1 == mask
    for size, bl in XOR_LAYOUT.items():
        assert L.xor_block_length(size) == bl, size


def test_fuse32_fpp_is_tiny():
    """fuse32 has no reference twin; validate via invariants: no false
    negatives (above) and zero false positives observed at 10^5 probes
    (expected rate 2^-32)."""
    keys = contiguous(5000)
    f = L.FuseFilter.build(keys, 32)
    probes = probes_nonmember(5000)
    assert int(f.contain(probes).sum()) == 0
