"""KMV (k-minimum-values / bottom-k) sketch: mergeable distinct-count
and Jaccard estimation over a key column.

The sketch keeps the ``k`` smallest distinct 64-bit hash values of a
key set.  Because "the k smallest of a union is the k smallest of the
union of per-part k-smallest sets", the sketch is trivially mergeable
in ANY partition order — the associativity property
BASELINE.json:north_rule requires of every sketch in this library (the
reference, FastFilter/xor_singleheader, has no KMV; the published
algorithm is Bar-Yossef et al. 2002, with the unbiased estimator
``(k-1) * H / h_k`` analysed in Beyer et al. 2007 and the bottom-k
Jaccard estimator in Cohen & Kaplan 2007).

Unlike the byte-blob sketches in functions/sketches.py, KMV is
expressed directly as DataFrame algebra, which buys three things at
100 TB:

- **Map-side reduction to O(k) rows per partition** before any
  shuffle: ``mapInPandas`` folds each partition's batches into its
  running bottom-k, so the exchange moves ``<= k * num_partitions``
  8-byte rows instead of the distinct key set (the groupBy-distinct
  alternative shuffles every distinct key — terabytes at 10^12 keys).
- **Everything after the fold is exact integer arithmetic** (the
  estimator divides in DECIMAL(38,0) / HUGEINT), so results are
  bit-identical under any partitioning and hash-checkable by a DuckDB
  oracle — no float drift, same policy as operators/graph.py:pagerank.
- **Engine-portable hashing**: the default hash is the first 15 hex
  chars of md5 (60 bits, positive in int64), computed by JVM codegen
  in Spark (`conv(substring(md5(k),1,15),16,10)`) and reproducible in
  any SQL engine with md5 — the property that makes the driver's
  oracle comparison possible.  Callers that don't need portability can
  pass ``hash_expr=F.xxhash64(...)`` with ``hmax=None`` (signed-order
  caveat documented below).

Accuracy: relative error of the distinct estimate is ~ 1/sqrt(k-2)
(Beyer et al. 2007); the Jaccard estimate m/k is unbiased with
standard error ~ sqrt(J(1-J)/k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["portable_hash60", "bottomk_hashes", "kmv_distinct",
           "kmv_jaccard", "HMAX60"]

#: exclusive upper bound of :func:`portable_hash60` (60-bit hash space)
HMAX60 = 1 << 60


def portable_hash60(col) -> "F.Column":
    """60-bit uniform hash of a column, identical in Spark and DuckDB:
    ``conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10)`` as
    BIGINT.  Non-string inputs hash their canonical decimal rendering
    (DuckDB twin: ``md5(CAST(x AS VARCHAR))``).

    15 hex chars keep the value positive in int64 (so signed and
    unsigned order agree) while leaving collision mass negligible for
    estimation: ~4e5 colliding pairs among 10^12 keys (n^2 / 2^61),
    a 4e-7 relative perturbation of the distinct estimate.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def bottomk_hashes(df: DataFrame, key_col: str, k: int,
                   hash_expr=None) -> DataFrame:
    """The ``k`` smallest distinct hash values of ``df[key_col]`` as a
    single-column DataFrame ``h: long`` (``< k`` rows when the input
    has fewer distinct keys; null keys are ignored).

    Plan shape: one narrow ``mapInPandas`` pass folds every partition
    to its own bottom-k (numpy ``np.unique`` keeps the running set
    sorted, so each batch merge is O(batch log batch)), then a global
    ``TakeOrderedAndProject`` over the ``<= k * partitions`` survivors.
    No wide exchange of the key set ever happens.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = hash_expr if hash_expr is not None \
        else portable_hash60(F.col(key_col))
    hashed = df.select(h.alias("h")).where(F.col("h").isNotNull())

    def fold(batches):
        import numpy as np
        import pandas as pd
        best = np.empty(0, dtype=np.int64)
        for pdf in batches:
            vals = pdf["h"].to_numpy(dtype=np.int64, copy=False)
            best = np.unique(np.concatenate([best, vals]))[:k]
        if len(best):
            yield pd.DataFrame({"h": best})

    partials = hashed.mapInPandas(fold, schema="h long")
    # distinct() first: the same hash can survive in several partitions'
    # bottom-k; the sets are tiny so this exchange is O(k * partitions)
    return partials.distinct().orderBy("h").limit(k)


def kmv_distinct(df: DataFrame, key_col: str, k: int = 1024,
                 hash_expr=None, hmax: int = HMAX60) -> DataFrame:
    """One-row distinct-count estimate: ``(n_min, kth_hash,
    distinct_est)``, all BIGINT.

    ``distinct_est = (k-1) * hmax DIV kth_hash`` (Beyer et al. 2007
    unbiased estimator) computed in DECIMAL(38,0) so the product never
    overflows and the result is bit-exact.  When fewer than ``k``
    distinct keys exist the sketch IS the key set and the exact count
    is returned (``kth_hash`` still reports the max retained hash).
    ``hmax`` is the exclusive hash-space bound — pass the right one if
    you override ``hash_expr`` (xxhash64 output is signed, so it needs
    a bias to 2^64 first; the default portable hash avoids all that).
    """
    bk = bottomk_hashes(df, key_col, k, hash_expr=hash_expr)
    agg = bk.agg(F.count("h").alias("n_min"), F.max("h").alias("kth_hash"))
    est = F.expr(
        f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {int(hmax)} "
        "DIV kth_hash AS BIGINT)")
    return agg.select(
        "n_min", "kth_hash",
        F.when(F.col("n_min") < k, F.col("n_min"))
         .otherwise(est).alias("distinct_est"))


def kmv_jaccard(df_a: DataFrame, df_b: DataFrame, key_col: str,
                k: int = 256, hash_expr=None) -> DataFrame:
    """One-row bottom-k Jaccard estimate between two key sets:
    ``(union_k, matches, jaccard_e6)``, all BIGINT.

    ``B_k(A ∪ B)`` is derived by merging the two sketches (bottom-k of
    their union — no second pass over the data), and ``matches`` counts
    its members present in BOTH per-set sketches;
    ``jaccard_e6 = matches * 1_000_000 DIV union_k`` (Cohen & Kaplan
    2007).  Every count is exact given the hashes, so the result is
    engine-reproducible.  The final joins touch <= k rows per side.
    """
    ba = bottomk_hashes(df_a, key_col, k, hash_expr=hash_expr)
    bb = bottomk_hashes(df_b, key_col, k, hash_expr=hash_expr)
    bu = ba.union(bb).distinct().orderBy("h").limit(k)
    both = (bu.join(ba, "h", "left_semi")
              .join(bb, "h", "left_semi"))
    est = F.expr("CAST(CAST(matches AS DECIMAL(38,0)) "
                 "* 1000000 DIV union_k AS BIGINT)")
    return (bu.agg(F.count("h").alias("union_k"))
            .crossJoin(both.agg(F.count("h").alias("matches")))
            .select("union_k", "matches",
                    # both inputs empty -> union_k = 0; avoid the ANSI
                    # division-by-zero error and define J(∅,∅) = 0
                    F.when(F.col("union_k") == 0, F.lit(0).cast("long"))
                     .otherwise(est).alias("jaccard_e6")))
