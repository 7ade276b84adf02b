"""Black-box differential tests against the COMPILED reference library.

tests/ref_shim.c is compiled at test time against the read-only
reference headers (/root/reference/include) and used as an oracle:

- same winning seed for the same input (validates the splitmix retry
  chain AND that our peel succeeds/fails on exactly the same seeds —
  peelability is a set property, independent of peel order);
- our serialized filters load in the reference deserializer and probe
  with zero false negatives there (wire-format + validity parity);
- reference-serialized filters load in OUR deserializer, probe all
  members, and agree with the reference's contain() BIT-FOR-BIT on
  random probes (the probe arithmetic is identical, so on the same
  fingerprint bytes the answers must match exactly).

Fingerprint BYTES may differ between implementations: any valid peel
order yields a correct assignment and the reference's LIFO order is an
implementation detail (see operators/local.py docstring).  Everything
observable — seeds, layout, sizes, probe semantics, guarantees — must
match, and does.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastfilter_spark.operators.local import build_filter, filter_from_bytes

REF_INCLUDE = "/root/reference/include"
_SHIM_SRC = os.path.join(os.path.dirname(__file__), "ref_shim.c")

KINDS = ["xor8", "xor16", "fuse8", "fuse16"]  # fuse32 has no reference twin


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    if not os.path.isdir(REF_INCLUDE):
        pytest.skip("reference headers not available")
    exe = str(tmp_path_factory.mktemp("shim") / "ref_shim")
    try:
        subprocess.run(["cc", "-O2", "-I", REF_INCLUDE, "-o", exe, _SHIM_SRC,
                        "-lm"], check=True, capture_output=True, timeout=120)
    except Exception as e:
        pytest.skip(f"cannot compile reference shim: {e}")
    return exe


def _tmp_u64(arr: np.ndarray) -> str:
    fd, path = tempfile.mkstemp(suffix=".bin")
    with os.fdopen(fd, "wb") as f:
        f.write(np.ascontiguousarray(arr, dtype="<u8").tobytes())
    return path


def _keysets():
    rng = np.random.default_rng(1234)
    return {
        "contiguous": np.arange(20_000, dtype=np.uint64),
        "random": rng.integers(0, 1 << 63, 20_000, dtype=np.uint64),
        "evens": np.arange(0, 40_000, 2, dtype=np.uint64),
        "small": np.arange(1000, dtype=np.uint64) * np.uint64(7),
    }


@pytest.mark.parametrize("kind", KINDS)
def test_same_winning_seed(shim, kind):
    for name, keys in _keysets().items():
        kf = _tmp_u64(keys)
        out = subprocess.run([shim, kind, "seed", kf], capture_output=True,
                             check=True, text=True)
        ref_seed = int(out.stdout.strip(), 16)
        ours = build_filter(keys, kind)
        assert (ours.seed & 0xFFFFFFFFFFFFFFFF) == ref_seed, (kind, name)
        os.unlink(kf)


@pytest.mark.parametrize("kind", KINDS)
def test_our_bytes_load_in_reference(shim, kind, tmp_path):
    keys = _keysets()["random"]
    ours = build_filter(keys, kind)
    fpath = str(tmp_path / "ours.filter")
    with open(fpath, "wb") as f:
        f.write(ours.to_bytes())
    kf = _tmp_u64(keys)
    out = subprocess.run([shim, kind, "contain", fpath, kf],
                         capture_output=True, check=True)
    got = np.frombuffer(out.stdout, dtype=np.uint8)
    assert got.size == keys.size
    assert got.all(), f"reference found false negatives in our {kind} bytes"
    os.unlink(kf)


@pytest.mark.parametrize("kind", KINDS)
def test_reference_bytes_probe_bitwise_in_ours(shim, kind, tmp_path):
    keys = _keysets()["contiguous"]
    kf = _tmp_u64(keys)
    fpath = str(tmp_path / "ref.filter")
    subprocess.run([shim, kind, "build", kf, fpath], check=True,
                   capture_output=True)
    with open(fpath, "rb") as f:
        blob = f.read()
    ours = filter_from_bytes(blob, kind)
    # zero false negatives through our probe
    assert ours.contain(keys).all()
    # bit-for-bit agreement on random probes (same bytes, same arithmetic)
    probes = np.random.default_rng(9).integers(0, 1 << 63, 200_000,
                                               dtype=np.uint64)
    pf = _tmp_u64(probes)
    out = subprocess.run([shim, kind, "contain", fpath, pf],
                         capture_output=True, check=True)
    ref_ans = np.frombuffer(out.stdout, dtype=np.uint8).astype(bool)
    our_ans = ours.contain(probes)
    assert (ref_ans == our_ans).all(), f"{kind}: probe divergence"
    os.unlink(kf)
    os.unlink(pf)


_PACK_CLASSES = {"xor8": 8, "xor16": 16, "fuse8": 8, "fuse16": 16}


def _unpack_ours(blob: bytes, kind: str):
    from fastfilter_spark.operators.local import FuseFilter, XorFilter
    cls = XorFilter if kind.startswith("xor") else FuseFilter
    return cls.unpack(blob, _PACK_CLASSES[kind])


@pytest.mark.parametrize("kind", KINDS)
def test_our_packed_bytes_load_in_reference(shim, kind, tmp_path):
    """Our pack() bytes must load via the reference's _unpack
    (xorfilter.h:1414-1434, binaryfusefilter.h:942-967) and probe with
    zero false negatives AND bit-for-bit agreement with our probe."""
    keys = _keysets()["random"]
    ours = build_filter(keys, kind)
    fpath = str(tmp_path / "ours.packed")
    with open(fpath, "wb") as f:
        f.write(ours.pack())
    kf = _tmp_u64(keys)
    out = subprocess.run([shim, kind, "containp", fpath, kf],
                         capture_output=True, check=True)
    got = np.frombuffer(out.stdout, dtype=np.uint8)
    assert got.size == keys.size and got.all(), \
        f"reference unpack found false negatives in our packed {kind}"
    probes = np.random.default_rng(17).integers(0, 1 << 63, 100_000,
                                                dtype=np.uint64)
    pf = _tmp_u64(probes)
    out = subprocess.run([shim, kind, "containp", fpath, pf],
                         capture_output=True, check=True)
    ref_ans = np.frombuffer(out.stdout, dtype=np.uint8).astype(bool)
    assert (ref_ans == ours.contain(probes)).all(), \
        f"{kind}: packed probe divergence"
    os.unlink(kf)
    os.unlink(pf)


@pytest.mark.parametrize("kind", KINDS)
def test_reference_packed_bytes_load_in_ours(shim, kind, tmp_path):
    """Reference _pack output loads in our unpack(); re-packing it must
    reproduce the reference's packed bytes EXACTLY (byte-level format
    parity both directions on the same fingerprint array)."""
    keys = _keysets()["contiguous"]
    kf = _tmp_u64(keys)
    fpath = str(tmp_path / "ref.packed")
    subprocess.run([shim, kind, "pack", kf, fpath], check=True,
                   capture_output=True)
    with open(fpath, "rb") as f:
        blob = f.read()
    ours = _unpack_ours(blob, kind)
    assert ours.contain(keys).all()
    assert ours.pack() == blob, f"{kind}: packed round-trip not byte-exact"
    os.unlink(kf)


@pytest.mark.parametrize("kind", KINDS)
def test_serialized_length_matches_reference(shim, kind, tmp_path):
    keys = _keysets()["small"]
    kf = _tmp_u64(keys)
    fpath = str(tmp_path / "ref.filter")
    subprocess.run([shim, kind, "build", kf, fpath], check=True,
                   capture_output=True)
    ours = build_filter(keys, kind)
    expected = os.path.getsize(fpath)
    if kind == "fuse16":
        # reference bug: binary_fuse16_serialization_bytes counts
        # SegmentLengthMask (binaryfusefilter.h:758) but serialize never
        # writes it (:773-790), so the reference "wire size" carries 4
        # trailing uninitialized bytes.  We serialize what serialize
        # writes (see FuseFilter.to_bytes docstring).
        expected -= 4
    assert len(ours.to_bytes()) == expected
    os.unlink(kf)
