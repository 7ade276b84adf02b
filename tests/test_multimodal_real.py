"""Real-codec tests for the multimodal ``decode="real"`` plug point.

The PNG bytes under test are produced by a local stdlib-only encoder
(zlib + chunk CRCs) that can emit any of the five scanline filters, so
the decoder's full filter-reconstruction matrix (None/Sub/Up/Average/
Paeth) is exercised against known pixel arrays; WAV bytes come from the
stdlib ``wave`` writer.  No external imaging/audio library anywhere.
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod
import zlib

import numpy as np
import pytest

from fastfilter_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _phash64,
    _png_decode_gray,
    _wav_decode,
    audio_frame_sample,
    image_features,
)

_NCH = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_encode(img: np.ndarray, color_type: int,
                filters: list[int]) -> bytes:
    """Minimal spec-faithful PNG encoder (8-bit, non-interlaced).
    ``filters[y % len(filters)]`` picks each scanline's filter, so a
    single image can exercise every reconstruction path."""
    nch = _NCH[color_type]
    if img.ndim == 2:
        img = img[..., None]
    h, w = img.shape[:2]
    assert img.shape[2] == nch
    px = img.reshape(h, w * nch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = px[y]
        enc = np.empty(w * nch, np.int32)
        for x in range(w * nch):
            a = int(line[x - nch]) if x >= nch else 0
            b = int(prev[x])
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - (a + b) // 2
            else:
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                v = line[x] - pred
            enc[x] = v & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(t: bytes, d: bytes) -> bytes:
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _wav_encode(samples: np.ndarray, nch: int = 1,
                rate: int = 16000) -> bytes:
    """16-bit PCM WAV bytes from an int16 array (frames x channels)."""
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# -- pure-python codec tests --------------------------------------------------

def test_png_roundtrip_gray_all_filters():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 11), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = _png_decode_gray(_png_encode(img, 0, filters))
        assert np.array_equal(out, img), f"filters={filters}"


def test_png_rgb_collapses_to_bt601_luma():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 8, 3), dtype=np.uint8)
    out = _png_decode_gray(_png_encode(img, 2, [4, 3, 2, 1, 0]))
    rgb = img.astype(np.uint32)
    want = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2])
            // 1000).astype(np.uint8)
    assert np.array_equal(out, want)


def test_png_alpha_channels_dropped():
    rng = np.random.default_rng(13)
    ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)   # gray+alpha
    assert np.array_equal(
        _png_decode_gray(_png_encode(ga, 4, [1, 4])), ga[..., 0])
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    rgb = rgba[..., :3].astype(np.uint32)
    want = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2])
            // 1000).astype(np.uint8)
    assert np.array_equal(
        _png_decode_gray(_png_encode(rgba, 6, [2, 3])), want)


def test_png_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        _png_decode_gray(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    # 16-bit depth: patch the IHDR of a valid PNG (CRC is not checked
    # by the decoder, so only the depth byte needs to change)
    png = bytearray(_png_encode(np.zeros((2, 2), np.uint8), 0, [0]))
    png[8 + 8 + 8] = 16  # sig + IHDR len/type + w/h -> bit-depth byte
    with pytest.raises(ValueError, match="bit_depth=16"):
        _png_decode_gray(bytes(png))


def test_wav_decode_mono_stereo_and_reject():
    t = np.arange(256)
    mono = (np.sin(t / 7.0) * 20000).astype(np.int16)
    got = _wav_decode(_wav_encode(mono))
    assert np.allclose(got, mono / 32768.0)
    stereo = np.stack([mono, -mono], axis=1)
    got2 = _wav_decode(_wav_encode(stereo, nch=2))
    assert np.allclose(got2, (mono / 32768.0 + -mono / 32768.0) / 2)
    with pytest.raises(ValueError, match="not PCM WAV"):
        _wav_decode(b"ID3\x04 definitely an mp3")


# -- end-to-end through Spark -------------------------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_image_features_real_end_to_end(spark):
    """decode='real' over genuine PNG payloads matches a local numpy
    replay of the same decode+featurize, per media_id."""
    rng = np.random.default_rng(23)
    imgs = {i: rng.integers(0, 256, (16, 16), dtype=np.uint8)
            for i in range(6)}
    rows = [(i, "image", bytearray(_png_encode(im, 0, [i % 5])),
             (16, 16, None, None, "png")) for i, im in imgs.items()]
    got = {r["media_id"]: r for r in
           image_features(_media_df(spark, rows).repartition(3),
                          decode="real").collect()}
    assert set(got) == set(imgs)
    for i, im in imgs.items():
        assert got[i]["mean_pixel"] == pytest.approx(im.mean())
        assert got[i]["std_pixel"] == pytest.approx(
            im.astype(np.float64).std())
        assert got[i]["phash"] == int(_phash64(im))


def test_audio_frame_sample_real_end_to_end(spark):
    t = np.arange(1000)
    clip = (np.sin(t / 11.0) * 30000).astype(np.int16)
    rows = [(0, "audio", bytearray(_wav_encode(clip)),
             (None, None, 16000, None, "wav"))]
    out = audio_frame_sample(_media_df(spark, rows), n_samples=16,
                             decode="real").collect()
    assert len(out) == 1
    wave = clip / 32768.0
    idx = np.linspace(0, len(wave) - 1, 16).astype(int)
    assert np.allclose(out[0]["samples"], wave[idx].astype(np.float32))
