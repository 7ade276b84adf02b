"""Golden-vector tests for the uint64 numpy kernels against values produced
by executing the reference C library (see tests/golden_vectors.py)."""

import numpy as np
import pytest

from fastfilter_spark.functions import kernels as K
from tests import golden_vectors as G


def _arr(xs):
    return np.array(xs, dtype=np.uint64)


def test_murmur64_golden():
    keys = _arr(list(G.MURMUR64))
    got = K.murmur64(keys)
    assert [int(x) for x in got] == list(G.MURMUR64.values())


def test_mix_split_golden():
    keys = _arr(list(G.MIX_SPLIT))
    got = K.mix_split(keys, G.MIX_SPLIT_SEED)
    assert [int(x) for x in got] == list(G.MIX_SPLIT.values())


def test_splitmix64_chains():
    state = K.XOR_RNG_START
    out = []
    for _ in range(8):
        state, v = K.splitmix64(state)
        out.append(v)
    assert out == G.SPLITMIX_XOR_CHAIN

    state = K.FUSE_RNG_START
    out = []
    for _ in range(8):
        state, v = K.splitmix64(state)
        out.append(v)
    assert out == G.SPLITMIX_FUSE_CHAIN


def test_splitmix64_stream_matches_scalar():
    vals = K.splitmix64_stream(K.XOR_RNG_START, 8)
    assert [int(v) for v in vals] == G.SPLITMIX_XOR_CHAIN


def test_mulhi_golden():
    for (a, b), want in G.MULHI.items():
        got = K.mulhi(_arr([a]), b)
        assert int(got[0]) == want, (hex(a), hex(b))


def test_mulhi_vs_python_bigint():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)
    for b in (3, 0x9E3779B97F4A7C15, (1 << 64) - 1, 1 << 32):
        got = K.mulhi(a, b)
        want = [(int(x) * b) >> 64 for x in a]
        assert [int(x) for x in got] == want


def test_xor_index_triple_golden():
    keys = _arr(list(G.XOR_TRIPLES_BL1000))
    hashes = K.mix_split(keys, G.MIX_SPLIT_SEED)
    h0, h1, h2 = K.xor_index_triple(hashes, 1000)
    for i, key in enumerate(G.XOR_TRIPLES_BL1000):
        want_h, w0, w1, w2 = G.XOR_TRIPLES_BL1000[key]
        assert int(hashes[i]) == want_h
        assert (int(h0[i]), int(h1[i]), int(h2[i])) == (w0, w1, w2)


def test_fuse_index_triple_golden():
    sl, mask, _sc, scl, _al = G.FUSE_LAYOUT[1000]
    keys = _arr(list(G.FUSE_TRIPLES_N1000))
    hashes = K.mix_split(keys, G.FUSE_SEED_N1000)
    h0, h1, h2 = K.fuse_index_triple(hashes, sl, mask, scl)
    e0, e1, e2 = K.fuse_index_triple_exact(hashes, sl, mask, scl)
    for i, key in enumerate(G.FUSE_TRIPLES_N1000):
        want_h, w0, w1, w2 = G.FUSE_TRIPLES_N1000[key]
        assert int(hashes[i]) == want_h
        assert (int(h0[i]), int(h1[i]), int(h2[i])) == (w0, w1, w2)
        assert (int(e0[i]), int(e1[i]), int(e2[i])) == (w0, w1, w2)


def test_rotl64():
    h = _arr([0x8000000000000001])
    assert int(K.rotl64(h, 1)[0]) == 0x0000000000000003
    assert int(K.rotl64(h, 0)[0]) == 0x8000000000000001
    assert int(K.rotl64(h, 64)[0]) == 0x8000000000000001


def test_reduce32_range():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 32, size=10000, dtype=np.uint64)
    out = K.reduce32(h, 1000)
    assert out.min() >= 0 and out.max() < 1000
    # exact formula check
    want = [(int(x) * 1000) >> 32 for x in h[:100]]
    assert [int(x) for x in out[:100]] == want


def test_no_float_promotion():
    """The classic numpy footgun: uint64 op python-int promotes to float64.
    Ensure all kernels return uint64 exactly."""
    keys = _arr([0xFFFFFFFFFFFFFFFF, 1, 2])
    for fn in (lambda k: K.murmur64(k), lambda k: K.mix_split(k, 5),
               lambda k: K.rotl64(k, 21), lambda k: K.fingerprint64(k),
               lambda k: K.mulhi(k, 12345)):
        out = fn(keys)
        assert out.dtype == np.uint64


def test_to_uint64_roundtrip():
    vals = [0, 1, (1 << 63), (1 << 64) - 1]
    u = K.to_uint64(np.array(vals, dtype=object))
    i = K.to_int64(u)
    back = K.to_uint64(i)
    assert [int(x) for x in back] == vals
