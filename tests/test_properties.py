"""Property-based tests (hypothesis): invariants over arbitrary inputs.

The reference's tests are example-based (tests/unit.c); these push the
same guarantees — zero false negatives, serialize round-trips, merge
associativity — across randomized key sets, duplicate patterns, and
partition splits.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from fastfilter_spark.functions.sketches import (
    Bloom, CountMin, HyperLogLog, KLL,
)
from fastfilter_spark.operators.local import build_filter, filter_from_bytes

_SETTINGS = dict(deadline=None, max_examples=25,
                 suppress_health_check=[HealthCheck.too_slow])

key_arrays = st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=4000) \
    .map(lambda xs: np.array(xs, dtype=np.uint64))


@given(keys=key_arrays, kind=st.sampled_from(
    ["xor8", "xor16", "fuse8", "fuse16", "fuse32"]))
@settings(**_SETTINGS)
def test_filter_no_false_negatives_and_roundtrip(keys, kind):
    f = build_filter(keys, kind)
    assert f.contain(keys).all()
    rt = filter_from_bytes(f.to_bytes(), kind)
    assert rt.contain(keys).all()
    assert rt.to_bytes() == f.to_bytes()
    unpacked = type(f).unpack(f.pack(), f.fingerprint_bits)
    assert (unpacked.fingerprints == f.fingerprints).all()


@given(keys=key_arrays, dup_take=st.integers(1, 50))
@settings(**_SETTINGS)
def test_fuse_duplicate_tolerance(keys, dup_take):
    dups = np.concatenate([keys, keys[:min(dup_take, keys.size)]])
    f = build_filter(dups, "fuse8")
    assert f.contain(dups).all()


@given(vals=st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=5000),
       n_chunks=st.integers(1, 7), perm_seed=st.integers(0, 1000))
@settings(**_SETTINGS)
def test_hll_cms_bloom_merge_invariant_under_partitioning(vals, n_chunks,
                                                          perm_seed):
    arr = np.array(vals, dtype=np.int64)
    chunks = np.array_split(arr, n_chunks)
    order = np.random.default_rng(perm_seed).permutation(n_chunks)

    whole_h = HyperLogLog(8).update(arr)
    whole_c = CountMin(256, 3).update(arr)
    whole_b = Bloom(4096, 3).update(arr)

    h = HyperLogLog(8)
    c = CountMin(256, 3)
    b = Bloom(4096, 3)
    for i in order:
        if chunks[i].size:
            h = h.merge(HyperLogLog(8).update(chunks[i]))
            c = c.merge(CountMin(256, 3).update(chunks[i]))
            b = b.merge(Bloom(4096, 3).update(chunks[i]))
    assert h.to_bytes() == whole_h.to_bytes()
    assert c.to_bytes() == whole_c.to_bytes()
    assert b.to_bytes() == whole_b.to_bytes()


@given(vals=st.lists(st.floats(-1e9, 1e9), min_size=10, max_size=8000),
       n_chunks=st.integers(1, 5))
@settings(**_SETTINGS)
def test_kll_merge_rank_bound(vals, n_chunks):
    arr = np.array(vals, dtype=np.float64)
    chunks = np.array_split(arr, n_chunks)
    acc = KLL(100)
    for ch in chunks:
        if ch.size:
            acc = acc.merge(KLL(100).update(ch))
    assert acc.n == arr.size
    sv = np.sort(arr)
    for q in (0.25, 0.5, 0.75):
        est = acc.quantile(q)
        # with ties the value occupies a rank interval; accept if q is
        # within a loose band of it (tiny k, tiny inputs)
        lo = np.searchsorted(sv, est, side="left") / sv.size
        hi = np.searchsorted(sv, est, side="right") / sv.size
        assert lo - 0.15 <= q <= hi + 0.15, (q, lo, hi)
