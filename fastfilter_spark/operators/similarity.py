"""Approximate-nearest-neighbor search over embedding columns.

Two paths over `embeddings(vec_id, embedding array<float>, label)`:

- ``brute_force_topk`` — exact cosine top-k, fully JVM-side
  (``F.zip_with`` dot product + ``F.aggregate`` fold, no Python), a
  single narrow scan + global top-k (Spark's TakeOrderedAndProject —
  per-partition heaps, only k rows per partition reach the driver).
  The baseline and correctness oracle.
- ``ivf_topk`` — IVF (inverted-file) index: k-means centroids fitted on
  a driver-side sample, cluster id materialized per row (one pass,
  Arrow UDF), stored partitioned by cluster.  A query probes only the
  ``nprobe`` nearest clusters => scan cost drops by ~ncells/nprobe.
  At 100 TB the cluster column is a partition key, so probing is
  partition pruning at the source level, not a filter after a scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType


def _cosine_col(vec_col, query: list[float]):
    """JVM-only cosine(vec, query): zip_with product + aggregate sum."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(F.zip_with(vec_col, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm_v = F.sqrt(F.aggregate(F.transform(vec_col, lambda a: a * a),
                                F.lit(0.0), lambda acc, v: acc + v))
    qn = float(np.linalg.norm(query))
    return dot / (norm_v * F.lit(qn if qn > 0 else 1.0))


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine), descending, ties by id."""
    return (df.select(F.col(id_col),
                      _cosine_col(F.col(vec_col), query).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


class IVFIndex:
    """Inverted-file ANN index: centroids on the driver, assignments in
    the table.  ``fit`` samples rows (bounded collect), runs a few Lloyd
    iterations in numpy; ``assign`` adds a cluster column (Arrow UDF,
    one pass); ``search`` probes the nprobe nearest cells."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (ncells, dim), L2-normalized

    @classmethod
    def fit(cls, df: DataFrame, vec_col: str = "embedding",
            ncells: int = 16, sample_rows: int = 10_000,
            iters: int = 10, seed: int = 7) -> "IVFIndex":
        # hash-ordered take, NOT limit(): limit takes the FIRST rows, so
        # an input sorted/clustered by label or time would show k-means
        # one region only and recall would degrade silently.  Ordering
        # by a seeded xxhash64 of the vector is a deterministic uniform
        # sample (TakeOrderedAndProject: per-partition top-n + merge —
        # no full sort/shuffle of the table).
        sample = np.stack([np.asarray(r[0]) for r in
                           df.select(vec_col)
                           .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
                           .limit(sample_rows).collect()]
                          ).astype(np.float64)
        sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)
        cent = sample[rng.choice(len(sample), size=min(ncells, len(sample)),
                                 replace=False)]
        for _ in range(iters):
            sims = sample @ cent.T
            assign = sims.argmax(axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = sample[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        return cls(cent)

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        cent = self.centroids

        @F.pandas_udf(IntegerType())
        def cell(s: pd.Series) -> pd.Series:
            M = np.stack(s.map(np.asarray).to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            return pd.Series((M @ cent.T).argmax(axis=1).astype(np.int32))

        return df.withColumn("cell", cell(F.col(vec_col)))

    def search(self, assigned: DataFrame, query: list[float], k: int = 10,
               nprobe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
        q = np.asarray(query, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        order = np.argsort(-(self.centroids @ qn))
        probe_cells = [int(c) for c in order[:nprobe]]
        pruned = assigned.where(F.col("cell").isin(probe_cells))
        return brute_force_topk(pruned, query, k, id_col, vec_col)

    def batch_search(self, assigned: DataFrame, queries: DataFrame,
                     k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "q_id",
                     qvec_col: str = "q_vec") -> DataFrame:
        """Batch ANN through the IVF index: top-k corpus neighbors per
        query row, scanning only the UNION of the queries' probe cells.

        The eval-set-scale composition ``pairwise_topk_join`` lacks:
        the query batch is broadcast (collected — same small-side
        precondition), each query's ``nprobe`` nearest cells are ranked
        driver-side against the centroids, and the corpus scan is
        filtered to ``cell IN (union of probe cells)`` — on a table
        PARTITIONED BY cell that filter is partition pruning at the
        source, so the scanned-file count drops by ~ncells/nprobe (the
        per-query narrowing below it costs a mask, not I/O).  Inside
        the Arrow batches each corpus row scores only against the
        queries that probe its cell, then one per-query window takes
        the global top-k.

        Per-query results are IDENTICAL to ``search`` (same probe
        set, same cosine, same (cosine desc, id) tie order).
        """
        qrows = queries.select(qid_col, qvec_col).collect()
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        Q = np.stack([np.asarray(r[1]) for r in qrows]).astype(np.float64)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        ncells = len(self.centroids)
        nprobe = min(nprobe, ncells)
        # (nq, nprobe) nearest cells per query -> (nq, ncells) bool mask
        order = np.argsort(-(Q @ self.centroids.T), axis=1)[:, :nprobe]
        probe_mask = np.zeros((len(qids), ncells), dtype=bool)
        np.put_along_axis(probe_mask, order, True, axis=1)
        cells_needed = sorted(int(c) for c in np.unique(order))

        pruned = (assigned.where(F.col("cell").isin(cells_needed))
                  .select(id_col, "cell", vec_col))

        def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if not len(pdf):
                    continue
                M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()
                             ).astype(np.float64)
                M /= np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                sims = Q @ M.T                            # (nq, batch)
                allowed = probe_mask[:, pdf["cell"].to_numpy()]
                sims = np.where(allowed, sims, -np.inf)
                ids = pdf[id_col].to_numpy()
                kk = min(k, sims.shape[1])
                # per-row lexsort (cosine desc, id asc), NOT
                # argpartition: ties at the kk-th boundary must resolve
                # exactly as the final window and the per-query path do,
                # or a tied id could be dropped here and never recovered
                ids_b = np.broadcast_to(ids, sims.shape)
                top = np.lexsort((ids_b, -sims), axis=1)[:, :kk]
                best = np.take_along_axis(sims, top, axis=1)
                keep = np.isfinite(best).ravel()
                yield pd.DataFrame({
                    qid_col: np.repeat(qids, kk)[keep],
                    id_col: ids[top].ravel()[keep],
                    "cosine": best.ravel()[keep],
                })

        partial = pruned.mapInPandas(
            score, schema=f"{qid_col} long, {id_col} long, cosine double")
        w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"),
                                                F.col(id_col))
        return (partial.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= k).drop("_rk"))


def pairwise_topk_join(df: DataFrame, queries: DataFrame, k: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """Batch ANN: top-k corpus neighbors per query row via a broadcast
    cross score inside mapInPandas (queries must be small enough to
    broadcast — the typical eval-set shape).  Scans the WHOLE corpus;
    on a cell-partitioned table prefer ``IVFIndex.batch_search``, which
    keeps this exact per-batch scoring shape but prunes the scan to the
    union of the queries' probe cells first."""
    qrows = queries.select(qid_col, qvec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1]) for r in qrows]).astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = Q @ M.T                      # (nq, batch)
            ids = pdf[id_col].to_numpy()
            kk = min(k, sims.shape[1])
            # (cosine desc, id asc) like the final window — a tie at
            # the kk-th boundary must not drop the lower id here
            top = np.lexsort((np.broadcast_to(ids, sims.shape), -sims),
                             axis=1)[:, :kk]
            out = pd.DataFrame({
                qid_col: np.repeat(qids, kk),
                id_col: ids[top].ravel(),
                "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
            })
            yield out

    partial = df.select(id_col, vec_col).mapInPandas(
        score, schema=f"{qid_col} long, {id_col} long, cosine double")
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.col(id_col))
    return partial.withColumn("_rk", F.row_number().over(w)) \
        .where(F.col("_rk") <= k).drop("_rk")
