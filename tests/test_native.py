"""Differential tests: native (C) kernel vs numpy fallback.

Both implement the same algorithms (SURVEY.md §2); any valid peel order
yields a correct filter, so cross-path guarantees are behavioral:
identical winning seeds (peelability is a set property), zero false
negatives both ways, byte-level self-consistency within a path, and
bit-identical probe results on each other's filters.
"""

import subprocess
import sys

import numpy as np
import pytest

from fastfilter_spark.functions.native import get_kernel

pytestmark = pytest.mark.skipif(get_kernel() is None,
                                reason="no C compiler available")


def _numpy_build(kind: str, keys: np.ndarray):
    """Build in a subprocess with FASTFILTER_NO_NATIVE to get the pure
    numpy path (the flag is read once per process)."""
    code = (
        "import numpy as np, sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from fastfilter_spark.operators.local import build_filter\n"
        "keys = np.frombuffer(sys.stdin.buffer.read(), dtype=np.uint64)\n"
        f"f = build_filter(keys, '{kind}')\n"
        "sys.stdout.buffer.write(f.to_bytes())\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], input=keys.tobytes(),
        capture_output=True, env={"FASTFILTER_NO_NATIVE": "1",
                                  "PATH": "/usr/bin:/bin"},
        check=True)
    return out.stdout


@pytest.mark.parametrize("kind", ["xor8", "xor16", "fuse8", "fuse16", "fuse32"])
def test_native_vs_numpy_same_seed_and_guarantees(kind):
    from fastfilter_spark.operators.local import (
        build_filter, filter_from_bytes)
    keys = (np.arange(20_000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    nat_f = build_filter(keys, kind)                      # native path
    np_bytes = _numpy_build(kind, keys)                   # numpy path
    np_f = filter_from_bytes(np_bytes, kind)
    # identical winning seed: peel success is order-independent
    assert nat_f.seed == np_f.seed
    # identical layout/params => identical serialized length
    assert len(nat_f.to_bytes()) == len(np_bytes)
    # zero false negatives on both
    assert nat_f.contain(keys).all()
    assert np_f.contain(keys).all()
    # native probe of the numpy-built filter (cross-path) still has zero
    # false negatives — probes only depend on (seed, fingerprints)
    assert filter_from_bytes(np_bytes, kind).contain(keys).all()


def test_native_probe_matches_numpy_probe_bitwise():
    """Same filter bytes, both probe paths, random probes -> identical."""
    from fastfilter_spark.operators.local import build_filter
    keys = np.arange(50_000, dtype=np.uint64)
    f = build_filter(keys, "fuse8")
    probes = np.random.default_rng(3).integers(
        0, 1 << 63, size=200_000, dtype=np.uint64)
    nat = get_kernel()
    got_native = nat.fuse_contain(probes, f.seed, f.segment_length,
                                  f.segment_count_length, f.fingerprints)
    # numpy path: call the pure-python logic directly
    from fastfilter_spark.functions import kernels as K
    hashes = K.mix_split(probes, f.seed)
    fv = K.fingerprint64(hashes).astype(f.fingerprints.dtype)
    g0, g1, g2 = K.fuse_index_triple(hashes, f.segment_length,
                                     f.segment_length_mask,
                                     f.segment_count_length)
    fp = f.fingerprints
    got_numpy = (fv ^ fp[g0.astype(np.int64)] ^ fp[g1.astype(np.int64)]
                 ^ fp[g2.astype(np.int64)]) == 0
    assert (got_native == got_numpy).all()


def test_native_duplicate_tolerance():
    from fastfilter_spark.operators.local import build_filter
    keys = np.concatenate([np.arange(5000, dtype=np.uint64),
                           np.arange(10, dtype=np.uint64)])  # 10 dups
    f = build_filter(keys, "fuse8")
    assert f.contain(keys).all()


def test_native_fpp_bound():
    from fastfilter_spark.operators.local import build_filter
    f = build_filter(np.arange(100_000, dtype=np.uint64), "fuse8")
    probes = np.random.default_rng(9).integers(
        1 << 40, 1 << 62, size=1_000_000, dtype=np.uint64)
    assert f.contain(probes).mean() <= (1 / 256) * 1.25
