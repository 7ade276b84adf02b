"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs —
the storage model that works at 100 TB (bytes stay columnar, metadata
prunable).  Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each task streams record batches instead of
materializing a partition of blobs.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is stubbed two ways, as the round instructions require:

- ``decode = "fake"``  — deterministic synthetic decode (bytes -> stable
  pseudo-pixels/samples via the splitmix64 chain) so the full pipeline
  (schema, batching, partitioning, downstream features) runs and is
  testable end-to-end;
- ``decode = "real"``  — raises ``NotImplementedError`` at the decode
  call site, clearly marking where a real codec plugs in.

Everything around the stub — schemas, batch iteration, UDF signatures,
metadata handling — is real Spark code, identical to what a production
deployment would run.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from fastfilter_spark.functions import kernels as K

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), False),     # opaque encoded bytes
    StructField("meta", StructType([                 # typed, prunable
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]), False),
])


def synthesize_media(spark, n_rows: int, kind: str = "image",
                     seed: int = 42) -> DataFrame:
    """Deterministic opaque media rows (payload = pseudo-random bytes whose
    content is a pure function of media_id)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            rows = []
            for i in ids:
                stream = K.splitmix64_stream(int(K.mix_split(
                    np.array([i], dtype=np.uint64), seed)[0]), 64)
                payload = stream.astype("<u8").tobytes()
                rows.append({
                    "media_id": int(i), "kind": kind, "payload": payload,
                    "meta": {"width": 32, "height": 16, "sample_rate": 16000,
                             "n_frames": 8, "codec": "synthetic"},
                })
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-pixels: repeat/trim payload bytes to w*h."""
    a = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = -(-need // len(a))
    return np.tile(a, reps)[:need].reshape(height, width)


_PHASH_WEIGHTS = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)


def _phash64(img: np.ndarray) -> np.int64:
    """Perceptual-hash-shaped fingerprint: 8x8 block means -> sign bits
    vs the block mean, packed MSB-first into an int64."""
    h, w = img.shape
    blocks = img[:h // 8 * 8, :w // 8 * 8] \
        .reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    return (bits.astype(np.uint64) * _PHASH_WEIGHTS) \
        .sum(dtype=np.uint64).astype(np.int64)


def _phash64_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized _phash64 over a uniform-shaped (n, h, w) stack —
    bit-identical to the per-image form (same float64 block means, same
    MSB-first packing)."""
    n, h, w = imgs.shape
    blocks = imgs[:, :h // 8 * 8, :w // 8 * 8] \
        .reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2), keepdims=True)
    return (bits.reshape(n, 64).astype(np.uint64) * _PHASH_WEIGHTS) \
        .sum(axis=1, dtype=np.uint64).view(np.int64)


def image_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """(media_id, mean_pixel, std_pixel, phash long): decode -> grayscale
    stats + a perceptual-hash fingerprint (_phash64).

    Batch-vectorized: decode is per-image (that's the codec boundary),
    but stats + phash run across the whole Arrow batch as one numpy
    stack when shapes are uniform (the production common case — a real
    pipeline resizes before featurizing); mixed-shape batches fall back
    to per-image numpy, still with no pandas row iteration."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    out_schema = ("media_id long, mean_pixel double, std_pixel double, "
                  "phash long")

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in this "
                    "container); plug the codec in here")
            imgs = [_fake_decode_image(bytes(p), m["width"], m["height"])
                    for p, m in zip(pdf["payload"].to_numpy(),
                                    pdf["meta"].to_numpy())]
            if len({im.shape for im in imgs}) == 1:
                M = np.stack(imgs)
                means = M.mean(axis=(1, 2))
                stds = M.astype(np.float64).std(axis=(1, 2))
                phashes = _phash64_batch(M)
            else:
                means = np.array([im.mean() for im in imgs])
                stds = np.array([im.std() for im in imgs])
                phashes = np.array([_phash64(im) for im in imgs],
                                   dtype=np.int64)
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(),
                                "mean_pixel": means, "std_pixel": stds,
                                "phash": phashes})

    return df.where(F.col("kind") == "image") \
        .mapInPandas(feats, schema=out_schema)


def audio_frame_sample(df: DataFrame, n_samples: int = 16,
                       decode: str = "fake") -> DataFrame:
    """(media_id, samples array<float>): evenly-spaced sample grab — the
    frame-sampling shape used for audio/video preprocessing."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            if decode == "real":
                raise NotImplementedError(
                    "real audio decode requires ffmpeg/torchaudio; "
                    "plug the codec in here")
            samples = []
            for payload in pdf["payload"].to_numpy():
                # decode is per-clip (codec boundary; lengths vary)
                raw = np.frombuffer(bytes(payload), dtype="<u8")
                wave = (raw.astype(np.float64) / 2**63 - 1.0)
                idx = np.linspace(0, len(wave) - 1, n_samples).astype(int)
                samples.append(wave[idx].astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(),
                                "samples": samples})

    return df.where(F.col("kind").isin("audio", "video")) \
        .mapInPandas(sample, schema="media_id long, samples array<float>")
