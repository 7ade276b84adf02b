"""Deduplication operators for training-data pipelines.

Five tiers, cheapest first — the standard web-corpus dedup ladder:

1. exact          — hash-aggregate on a content fingerprint (pure SQL).
2. minhash LSH    — shingle -> minhash signature -> banded bucket join;
                    candidate pairs verified with exact Jaccard.
3. simhash        — 64-bit simhash; hamming<=d via banded equality
                    (pigeonhole) + JVM bit_count verify.
4. n-gram Jaccard — exact verification kernel (also standalone).
5. embedding      — cosine near-dup over `array<float>` embeddings
                    (see operators/similarity.py for the LSH variant).

Scale notes (the part that matters at 10^12 docs):

- Run exact dedup FIRST: identical texts share identical signatures, so
  feeding them to LSH creates quadratic bucket blowup.  `lsh_candidates`
  therefore de-dupes on fingerprint before banding.
- The band-bucket join shuffles (band, bucket_hash) pairs — rows*bands
  keys, uniformly hashed, no skew beyond genuine near-dup clusters; a
  `max_bucket` cap bounds the quadratic pair expansion of pathological
  buckets (rows in over-cap buckets are excluded from candidates — a
  recall/cost knob; raise `max_bucket` if exact-dup-heavy inputs were
  not pre-deduped).
- Verification joins texts back only for candidate pairs (a tiny
  fraction), so full texts never shuffle more than once.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from fastfilter_spark.functions import kernels as K
from fastfilter_spark.functions.text import doc_fingerprint, simhash_udf

_MERSENNE61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (first by fingerprint); single
    hash-aggregate shuffle on the 16-byte fingerprint, not the text."""
    fp = df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    return fp.dropDuplicates(["_fp"]).drop("_fp")


def duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, n_docs, doc_ids) for groups with >1 exact copy."""
    return (df.select(doc_fingerprint(F.col(text_col)).alias("fingerprint"),
                      F.col(id_col))
            .groupBy("fingerprint")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .where(F.col("n_docs") > 1))


# ---------------------------------------------------------------------------
# 2. minhash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of the char k-grams of ``text`` (murmur64 of packed
    bytes, functions/kernels.py).  NB: the byte-packing window caps at 8
    bytes, so shingle_k > 8 hashes the 8-byte prefix of each k-gram —
    fine for similarity (standard k is 3-5), documented for clarity."""
    b = text.encode("utf-8", "surrogatepass")
    if len(b) < k:
        b = b.ljust(k, b"\0")
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(a, min(k, 8))
    packed = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(win.shape[1]):
        packed = (packed << np.uint64(8)) | win[:, j]
    return np.unique(K.murmur64(packed))


def _minhash_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) per hash function from the splitmix64 chain."""
    vals = K.splitmix64_stream(0x5EEDFACE, 2 * n_hashes)
    a = (vals[:n_hashes] % np.uint64(_MERSENNE61 - 1)) + np.uint64(1)
    b = vals[n_hashes:] % np.uint64(_MERSENNE61)
    return a, b


def minhash_signature_udf(n_hashes: int = 128, shingle_k: int = 5):
    """pandas UDF: text -> array<long> minhash signature.

    min_i over shingles s of (a_i*s + b_i mod 2^61-1); universal-hash
    family, component-wise mergeable (elementwise min), deterministic.
    """
    a64, b64 = _minhash_params(n_hashes)
    a_int, b_int = a64.astype(object), b64.astype(object)  # exact python ints

    @F.pandas_udf(ArrayType(LongType()))
    def signature(s: pd.Series) -> pd.Series:
        out = []
        for txt in s.fillna("").to_numpy():
            sh = _shingle_hashes(txt, shingle_k).astype(object)
            # exact (a*s+b) mod p via python-int objects: 61-bit p would
            # overflow uint64 products
            sig = np.array(
                [int(min((int(ai) * int(x) + int(bi)) % _MERSENNE61
                         for x in sh))
                 for ai, bi in zip(a_int, b_int)],
                dtype=np.int64)
            out.append(sig)
        return pd.Series(out)

    return signature


def _mod_m61(v: np.ndarray) -> np.ndarray:
    """x mod 2^61-1 for uint64 x (fold high bits; two passes suffice)."""
    P = np.uint64(_MERSENNE61)
    v = (v & P) + (v >> np.uint64(61))
    v = (v & P) + (v >> np.uint64(61))
    return np.where(v >= P, v - P, v)


def _mulmod_pow2(v: np.ndarray, s: int) -> np.ndarray:
    """(v << s) mod 2^61-1 for v < 2^61 without uint64 overflow:
    v*2^s = (v >> (61-s))*2^61 + (v mod 2^(61-s))*2^s  and 2^61 ≡ 1."""
    lo_bits = 61 - s
    return _mod_m61((v >> np.uint64(lo_bits)) +
                    ((v & np.uint64((1 << lo_bits) - 1)) << np.uint64(s)))


def minhash_signature_fast_udf(n_hashes: int = 128, shingle_k: int = 5):
    """Vectorized minhash: (a*x+b) mod 2^61-1 computed in 32-bit limbs
    (a = a1*2^32+a0, x = x1*2^32+x0; every partial product < 2^64, each
    folded with the Mersenne identity 2^61 ≡ 1).  Matches
    minhash_signature_udf bit-for-bit at numpy speed.

    (A doc-blocked variant computing one (n_hashes, total_shingles)
    matrix per 64 docs with segmented reduceat minima was measured 7x
    SLOWER: per-doc (n_hashes, ~thousands) matrices stay L2-resident
    while block-sized temporaries spill to DRAM.  The O(shingles x
    hashes) arithmetic is the honest cost of the exact mod-p family —
    for the O(shingles) scale path see minhash_signature_oph_udf.)"""
    a, b = _minhash_params(n_hashes)
    a1 = (a >> np.uint64(32))[:, None]
    a0 = (a & np.uint64(0xFFFFFFFF))[:, None]
    bcol = b[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def signature(s: pd.Series) -> pd.Series:
        out = []
        for txt in s.fillna("").to_numpy():
            x = (_shingle_hashes(txt, shingle_k) % np.uint64(_MERSENNE61))[None, :]
            x1 = x >> np.uint64(32)
            x0 = x & np.uint64(0xFFFFFFFF)
            # a*x = a1x1*2^64 + (a1x0 + a0x1)*2^32 + a0x0 ; 2^64 ≡ 2^3
            t2 = _mulmod_pow2(_mod_m61(a1 * x1), 3)
            t1 = _mulmod_pow2(_mod_m61(a1 * x0 + a0 * x1), 32)
            t0 = _mod_m61(a0 * x0)
            sig = _mod_m61(t2 + t1 + t0 + bcol).min(axis=1).astype(np.int64)
            out.append(sig)
        return pd.Series(out)

    return signature


def minhash_signature_oph_udf(n_hashes: int = 128, shingle_k: int = 5):
    """One-permutation minhash (Li, Owen & Zhang 2012) with rotation
    densification (Shrivastava & Li 2014): ONE 64-bit hash per shingle,
    binned into ``n_hashes`` buckets, per-bucket minimum — O(shingles)
    work instead of the classic O(shingles x n_hashes), which makes the
    signature stage ~n_hashes-times cheaper at identical signature
    width.  Collision probability per component ~= Jaccard, so banding
    and the S-curve tuning apply unchanged; the exact-Jaccard verify
    step downstream makes precision identical either way.

    Empty buckets (only possible when a doc has fewer than ~8x
    n_hashes shingles) borrow the next filled bucket's value
    circularly — the densified estimator stays consistent.
    Deterministic; NOT cross-compatible with the (a*x+b) mod p family.
    """
    nh64 = np.uint64(n_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def signature(s: pd.Series) -> pd.Series:
        out = []
        idx = np.arange(n_hashes)
        sentinel = np.iinfo(np.int64).max
        for txt in s.fillna("").to_numpy():
            h = _shingle_hashes(txt, shingle_k)
            bins = (h % nh64).astype(np.int64)
            vals = (h >> np.uint64(1)).astype(np.int64)  # order-preserving
            sig = np.full(n_hashes, sentinel, dtype=np.int64)
            np.minimum.at(sig, bins, vals)
            empty = sig == sentinel
            if empty.any():
                filled = np.flatnonzero(~empty)
                if filled.size == 0:
                    sig[:] = 0
                else:
                    borrow = filled[
                        np.searchsorted(filled, idx) % filled.size]
                    sig = np.where(empty, sig[borrow], sig)
            out.append(sig)
        return pd.Series(out)

    return signature


def band_hashes(sig_col, n_hashes: int, bands: int):
    """array<long> of per-band hashes from a signature column (JVM-side:
    slice + hash per band — no Python).  The band index is mixed in so
    equal slices in different bands never collide."""
    r = n_hashes // bands
    return F.array(*[
        F.xxhash64(F.concat_ws(",", F.slice(sig_col, i * r + 1, r)
                               .cast("array<string>")), F.lit(i))
        for i in range(bands)
    ])


def lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n_hashes: int = 128,
                   bands: int = 32, shingle_k: int = 5,
                   max_bucket: int = 64,
                   with_estimate: bool = True,
                   family: str = "oph") -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b[, est_jaccard]).

    Pipeline: exact-dedup by fingerprint -> signature UDF -> per-band
    bucket hash -> posexplode -> self-join per (band, bucket) ->
    signature-agreement estimate.  ``max_bucket`` caps pathological
    buckets (count logged in the returned plan via `_capped` rows removed).

    ``with_estimate=False`` drops the signature columns before the join
    and distinct — cheaper when an exact-Jaccard verify follows anyway
    (the minhash_dedup_pairs path).

    ``family``: "oph" (default — one-permutation hashing, O(shingles)
    per doc, the 10^12-doc scale path) or "exact" (classic per-hash
    (a*x+b) mod p, O(shingles x n_hashes), bit-compatible with
    minhash_signature_udf).  Both are deterministic; candidate sets may
    differ slightly, which downstream exact-Jaccard verification
    absorbs.
    """
    if family not in ("oph", "exact"):
        raise ValueError("family must be 'oph' or 'exact'")
    sig = (minhash_signature_oph_udf if family == "oph"
           else minhash_signature_fast_udf)(n_hashes, shingle_k)
    uniq = exact_dedup(df.select(id_col, text_col), text_col)
    # AQE coalesces the small post-dedup shuffle to 1 partition, which
    # would serialize the (CPU-heavy) signature UDF — spread it back out
    par = df.sparkSession.sparkContext.defaultParallelism
    uniq = uniq.repartition(par)
    signed = uniq.withColumn("_sig", sig(F.col(text_col))) \
        .select(id_col, "_sig",
                F.posexplode(band_hashes(F.col("_sig"), n_hashes, bands))
                .alias("band", "bucket"))
    # drop oversized buckets (quadratic blowup guard)
    sized = signed.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("band", "bucket")))
    bounded = sized.where(F.col("_bsz") <= max_bucket).drop("_bsz")
    if not with_estimate:
        left = bounded.select(F.col(id_col).alias("id_a"), "band", "bucket")
        right = bounded.select(F.col(id_col).alias("id_b"), "band", "bucket")
        return (left.join(right, ["band", "bucket"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
    left = bounded.select(F.col(id_col).alias("id_a"),
                          F.col("_sig").alias("_sig_a"), "band", "bucket")
    right = bounded.select(F.col(id_col).alias("id_b"),
                           F.col("_sig").alias("_sig_b"), "band", "bucket")
    pairs = (left.join(right, ["band", "bucket"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "_sig_a", "_sig_b").distinct())
    est = F.aggregate(
        F.zip_with("_sig_a", "_sig_b",
                   lambda x, y: F.when(x == y, 1.0).otherwise(0.0)),
        F.lit(0.0), lambda acc, v: acc + v) / F.lit(float(n_hashes))
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def verify_jaccard(candidates: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_k: int = 5) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (joins texts back only
    for the candidate fraction)."""

    @F.pandas_udf(DoubleType())
    def jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        cache: dict[str, np.ndarray] = {}  # texts repeat across pairs

        def sh(t: str) -> np.ndarray:
            v = cache.get(t)
            if v is None:
                v = _shingle_hashes(t, shingle_k)
                cache[t] = v
            return v

        for i, (ta, tb) in enumerate(zip(a.fillna(""), b.fillna(""))):
            sa, sb = sh(ta), sh(tb)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out)

    texts = docs.select(F.col(id_col), F.col(text_col))
    j = (candidates
         .join(texts.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed(text_col, "_ta"), "id_a")
         .join(texts.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed(text_col, "_tb"), "id_b"))
    return j.withColumn("jaccard", jaccard("_ta", "_tb")) \
            .drop("_ta", "_tb")


def tune_bands(n_hashes: int, threshold: float) -> int:
    """Pick the band count whose LSH S-curve threshold (1/b)^(1/r) sits
    closest below ``threshold``: tighter banding means candidate volume
    tracks the verify threshold instead of exploding with
    medium-similarity pairs (the curve for 16x4 sits at ~0.5 — far too
    loose for a 0.8 verify)."""
    best_b, best_gap = 1, 1e9
    for r in range(1, n_hashes + 1):
        b = n_hashes // r
        if b * r != n_hashes or b < 1:
            continue
        s = (1.0 / b) ** (1.0 / r)
        gap = threshold - s
        if 0 <= gap < best_gap:
            best_b, best_gap = b, gap
    return best_b


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.8,
                        n_hashes: int = 128, bands: int | None = None,
                        **lsh_kw) -> DataFrame:
    """End-to-end near-dup pairs at exact Jaccard >= threshold.

    ``bands=None`` tunes the banding to the threshold (see tune_bands);
    candidates come from the OPH signature family by default
    (family="exact" in ``lsh_kw`` selects the classic per-hash form) and
    every returned pair is verified with EXACT shingle Jaccard, so the
    family choice affects recall cost, never precision.
    """
    if bands is None:
        bands = tune_bands(n_hashes, threshold)
    cand = lsh_candidates(df, id_col, text_col, with_estimate=False,
                          n_hashes=n_hashes, bands=bands, **lsh_kw)
    return verify_jaccard(cand, df, id_col, text_col) \
        .where(F.col("jaccard") >= threshold) \
        .select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# 3. simhash near-dup
# ---------------------------------------------------------------------------

def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  shingle_k: int = 3) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Banding by pigeonhole: split 64 bits into max_hamming+1 chunks — any
    pair within distance d agrees on >=1 chunk, so candidates = equality
    join per chunk (JVM hash join, no Python); verify via bit_count(xor)
    (JVM).  Complete (no false negatives) within the hamming radius.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sh = simhash_udf(shingle_k)
    par = df.sparkSession.sparkContext.defaultParallelism
    base = exact_dedup(df.select(id_col, text_col), text_col) \
        .repartition(par) \
        .withColumn("_sh", sh(F.col(text_col))).select(id_col, "_sh")
    chunks = base.select(
        id_col, "_sh",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("_sh"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)) for i in range(n_bands)
        ])).alias("band", "chunk"))
    left = chunks.select(F.col(id_col).alias("id_a"),
                         F.col("_sh").alias("_sh_a"), "band", "chunk")
    right = chunks.select(F.col(id_col).alias("id_b"),
                          F.col("_sh").alias("_sh_b"), "band", "chunk")
    pairs = (left.join(right, ["band", "chunk"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "_sh_a", "_sh_b").distinct())
    ham = F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")) \
                .where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# 5. embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.95,
                       n_planes: int = 12,
                       n_tables: int = 1,
                       plane_seed: int = 0xC0DE,
                       max_bucket: int | None = 256,
                       count_dropped: bool = False) -> DataFrame:
    """Pairs with cosine >= threshold via random-hyperplane LSH buckets.

    Sign-bit sketch of ``n_planes`` random hyperplanes -> bucket; exact
    cosine verify inside buckets (applyInPandas).  A pair at angle theta
    collides in one table with probability (1 - theta/pi)^n_planes —
    ~0.28 for cosine 0.95 at 12 planes — so recall comes from
    ``n_tables`` independent plane sets (all derived from
    ``plane_seed``), unioned and deduped: recall = 1-(1-p)^T, e.g.
    ~0.98 at T=12 for cosine-0.95 pairs.  Candidate volume and shuffle
    scale linearly with T (each row emits T bucket rows); exact dups
    (cosine 1.0) collide in EVERY table, so T=1 suffices for them.

    ``max_bucket`` caps per-(table, bucket) group size before the
    verify (whose cost is O(B^2) in memory and time): oversized buckets
    are truncated to their first ``max_bucket`` rows by id — pairs
    among the kept rows still surface the hot group (a wholesale drop
    would silently zero recall for it) — and pairs between kept and
    truncated rows are forfeited; ``None`` disables.  ``count_dropped``
    additionally logs how many rows the cap truncated (costs one extra
    job).
    """
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    rng = np.random.default_rng(plane_seed)

    def bucket_fn(dim: int):
        # one contiguous draw keeps table 0 identical to the historical
        # single-table behavior for the default seed
        planes = rng.standard_normal((dim, n_tables * n_planes))

        def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            weights = np.int64(1) << np.arange(n_planes - 1, -1, -1)
            for pdf in it:
                if not len(pdf):
                    continue
                lens = pdf[vec_col].map(len)
                if (lens != dim).any():
                    raise ValueError(
                        f"embedding_near_dup: {vec_col} rows with "
                        f"dimension(s) {sorted(set(lens[lens != dim]))} "
                        f"!= sampled dimension {dim}")
                M = np.stack(pdf[vec_col].map(np.asarray).to_numpy())
                bits = (M @ planes) > 0            # (n, T*P)
                for t in range(n_tables):
                    chunk = bits[:, t * n_planes:(t + 1) * n_planes]
                    bucket = chunk.astype(np.int64) @ weights
                    yield pd.DataFrame({
                        id_col: pdf[id_col], vec_col: pdf[vec_col],
                        "table": np.int32(t), "bucket": bucket})
        return fn

    # sample a NON-NULL vector for the dimension — first() on the raw
    # column can land on a null row and would misreport an input that
    # still holds real vectors as empty
    first_vec = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first_vec is None or first_vec[0] is None:
        # empty input (or all-null vectors): no pairs, and no dimension
        # to size the hyperplanes from
        return df.sparkSession.createDataFrame(
            [], schema="id_a long, id_b long, cosine double")
    dim = len(first_vec[0])
    # null vectors can't be near-duplicates of anything — drop them
    # JVM-side so the Arrow batches only carry stackable rows (a null
    # inside a batch would otherwise break np.stack)
    bucketed = (df.select(id_col, vec_col)
                .where(F.col(vec_col).isNotNull())).mapInPandas(
        bucket_fn(dim),
        schema=f"{id_col} long, {vec_col} array<float>, "
               "table int, bucket long")
    # quadratic-blowup guard (mirrors lsh_candidates): verify stacks a
    # whole bucket and computes M @ M.T, so one pathological bucket —
    # e.g. millions of all-zero/default embeddings landing in the
    # all-sign-bits-off bucket — is O(B^2) memory in a single task.
    # Oversized buckets are TRUNCATED to their first max_bucket rows
    # (deterministic id order), not dropped wholesale: dropping zeroes
    # recall for exactly the duplicate mass a near-dup operator exists
    # to find (at the default n_tables=1 no other table rescues the
    # rows), while truncation still surfaces the hot group through the
    # pairs among its kept rows and keeps the verify O(max_bucket^2).
    if max_bucket is not None:
        w = Window.partitionBy("table", "bucket").orderBy(id_col)
        sized = bucketed.withColumn("_rn", F.row_number().over(w))
        if count_dropped:
            # truncated-rows accounting costs one extra job (it re-runs
            # the bucketing UDF), so it's opt-in
            n_dropped = sized.where(F.col("_rn") > max_bucket).count()
            if n_dropped:
                import logging
                logging.getLogger(__name__).warning(
                    "embedding_near_dup: truncating %d bucket rows over "
                    "max_bucket=%d (raise n_planes to split hot buckets, "
                    "or max_bucket to widen the verify budget)",
                    n_dropped, max_bucket)
        bucketed = sized.where(F.col("_rn") <= max_bucket).drop("_rn")

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ M.T
        ids = pdf[id_col].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        lo = np.minimum(ids[ia[mask]], ids[ib[mask]])
        hi = np.maximum(ids[ia[mask]], ids[ib[mask]])
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "cosine": sims[ia[mask], ib[mask]]})

    return bucketed.groupBy("table", "bucket").applyInPandas(
        verify, schema="id_a long, id_b long, cosine double") \
        .dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# 6. benchmark decontamination (exact, filter-accelerated)
# ---------------------------------------------------------------------------

def decontaminate(train: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", eval_text_col: str | None = None,
                  kind: str = "fuse8", shard_bits: int = 0,
                  invert: bool = False) -> DataFrame:
    """Remove train rows whose exact text appears in an eval/benchmark
    set (``invert=True`` returns the contaminated rows instead).

    The standard pre-training decontamination shape: the eval set is
    small (10^3..10^7 texts) against a 10^12-row train corpus, so the
    train side must cross the cluster exactly once, unshuffled:

    1. an approximate-membership filter (this library's sharded fuse8)
       over the eval CONTENT KEYS is broadcast; a vectorized probe
       marks each train row maybe-contaminated.  Filters have no false
       negatives, so no contaminated row can slip past the probe.
    2. the exact check hides inside a *derived join key*:
       ``when(maybe, md5(text))`` — NULL for the ~everything that
       missed the filter.  A broadcast LEFT ANTI hash join against the
       distinct eval md5 fingerprints then removes exactly the true
       matches (NULL keys never equal anything, so filter-missed rows
       survive without ever being compared).  The plan stays a single
       scan + BroadcastHashJoin(LeftAnti): no shuffle of train, no
       nested-loop from a non-equi condition, and the 2^-8 false
       positives of step 1 cost only a broadcast-hash lookup each.

    Exactness: final membership is decided on the md5 fingerprint, not
    the 64-bit probe key, so filter/key collisions cannot drop a clean
    row.  ``shard_bits=0`` (one shard) is right for broadcastable eval
    sets; raise it when the eval set itself is huge.
    """
    from fastfilter_spark.functions.text import content_key, doc_fingerprint
    from fastfilter_spark.operators.dist import build_sharded

    ecol = eval_text_col or text_col
    spark = train.sparkSession
    for helper in ("_decon_key", "_eval_fp"):
        if helper in train.columns:
            # withColumn would silently REPLACE the caller's column and
            # the trailing drop would delete it from the result
            raise ValueError(
                f"train already has a column named {helper!r}, which "
                "decontaminate uses internally; rename it first")
    ev_keys = eval_df.select(content_key(F.col(ecol)).alias("key")) \
        .dropDuplicates()
    sf, _ = build_sharded(ev_keys, "key", kind=kind, shard_bits=shard_bits)
    maybe = sf.contains_udf(spark)(content_key(F.col(text_col)))
    ev_fp = eval_df.select(doc_fingerprint(F.col(ecol)).alias("_eval_fp")) \
        .distinct()
    dk = F.when(maybe, doc_fingerprint(F.col(text_col)))
    how = "left_semi" if invert else "left_anti"
    return train.withColumn("_decon_key", dk).join(
        F.broadcast(ev_fp), F.col("_decon_key") == F.col("_eval_fp"), how) \
        .drop("_decon_key")


# ---------------------------------------------------------------------------
# 7. corpus-level boilerplate-line removal (CCNet-style)
# ---------------------------------------------------------------------------

def remove_boilerplate_lines(docs: DataFrame, min_docs: int,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             sep: str = "\n",
                             broadcast_boiler: bool = True) -> DataFrame:
    """Strip lines that occur in >= ``min_docs`` DISTINCT documents
    (navigation bars, cookie banners, footers — the CCNet/RefinedWeb
    boilerplate pass), preserving each surviving line's original
    position.  Returns (id_col, text_clean); documents whose every
    line was boilerplate come back with an empty string, never dropped.

    Plan shape at 10^12 pages:
    - line df-count: explode → count_distinct(doc) per line.  Spark
      plans this as a two-phase distinct aggregate, so duplicate
      (line, doc) pairs collapse map-side; the exchange carries one row
      per distinct (line, doc), bounded by corpus line count.
    - the boilerplate set is usually SMALL (only lines repeated across
      >= min_docs pages qualify — navigation chrome, not content), so
      by default it broadcasts and the removal is a map-side
      BroadcastHashJoin(LeftAnti) over the exploded lines: the corpus
      itself never shuffles for the membership decision.  That holds
      only when ``min_docs`` is genuinely selective: a small
      ``min_docs`` on a line-heavy corpus makes the set corpus-scale
      and the forced hint would blow the broadcast limit — pass
      ``broadcast_boiler=False`` there to let AQE pick the join
      strategy (it still broadcasts when the built set turns out
      small).  ``min_docs`` must be >= 2 (at 1 every line is
      "boilerplate" and the output is all-empty documents).
    - reassembly groups the kept lines by document (one shuffle of the
      corpus — inherent to any reorder-preserving rewrite) and rebuilds
      text with array_sort over (pos, line) structs, all JVM built-ins.
    """
    import re as _re
    if int(min_docs) < 2:
        raise ValueError(
            f"min_docs={min_docs}: every line occurs in >=1 document, "
            "so min_docs < 2 strips all content; use >= 2 (and sizes "
            "large enough that the boilerplate set stays selective)")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("pos", "line"))
    boiler = (lines.groupBy("line")
              .agg(F.count_distinct(id_col).alias("_ndocs"))
              .where(F.col("_ndocs") >= int(min_docs))
              .select("line"))
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            sep).alias("text_clean"))
    return (docs.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


def ngram_decontaminate(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text",
                        eval_text_col: str | None = None,
                        id_col: str = "doc_id", n: int = 13,
                        kind: str = "fuse8", shard_bits: int = 0,
                        invert: bool = False) -> DataFrame:
    """N-gram decontamination (the GPT-3 appendix-C shape): remove
    train documents sharing ANY token ``n``-gram with the eval set —
    exact-text matching (:func:`decontaminate`) misses eval questions
    embedded inside a longer page; n-gram overlap catches them.

    Same filter-first architecture as :func:`decontaminate`, one level
    down (grams, not documents):

    1. eval's distinct gram strings (small: |eval| x ~tokens) back a
       broadcast sharded fuse filter on ``xxhash64(gram)``;
    2. train explodes to (id, gram) — a map-side flatMap, NO shuffle —
       and the vectorized probe discards ~every gram before anything
       wide happens (no false negatives: a contaminated gram cannot
       slip past);
    3. probe survivors (true matches + 2^-8 fp) hit an exact LEFT SEMI
       join on the gram STRING, so hash collisions cannot condemn a
       clean document.  The gram table is broadcast only when
       ``shard_bits == 0`` (the caller asserted a broadcast-sized eval
       set); with ``shard_bits > 0`` — raised precisely because the
       eval set is huge — |eval| x tokens gram STRINGS can be multi-GB,
       so the verify falls back to a shuffled semi join over the
       already-tiny probe survivors;
    4. the distinct contaminated id set (tiny in practice) drives the
       final broadcast anti/semi join against train.

    The only exchange over train-sized data is the distinct() on
    contaminated ids AFTER both pruning stages.  ``n`` defaults to 13
    (the published choice); small/synthetic corpora want smaller n.
    """
    from fastfilter_spark.functions.text import token_ngrams
    from fastfilter_spark.operators.dist import build_sharded

    ecol = eval_text_col or text_col
    spark = train.sparkSession
    ev_grams = (eval_df.select(
        F.explode(token_ngrams(F.col(ecol), n)).alias("gram"))
        .dropDuplicates())
    ev_keys = ev_grams.select(F.xxhash64("gram").alias("key")) \
        .dropDuplicates()
    sf, _ = build_sharded(ev_keys, "key", kind=kind,
                          shard_bits=shard_bits)
    tg = train.select(F.col(id_col),
                      F.explode(token_ngrams(F.col(text_col), n))
                      .alias("gram"))
    maybe = tg.where(sf.contains_udf(spark)(F.xxhash64("gram")))
    verify_side = F.broadcast(ev_grams) if shard_bits == 0 else ev_grams
    contaminated = (maybe.join(verify_side, "gram", "left_semi")
                    .select(id_col).distinct())
    how = "left_semi" if invert else "left_anti"
    return train.join(F.broadcast(contaminated), id_col, how)
