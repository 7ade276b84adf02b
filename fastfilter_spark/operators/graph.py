"""Connected components over near-duplicate pairs.

The dedup operators (minhash / simhash / embedding) emit PAIRS; a
corpus dedup must then keep ONE document per duplicate CLUSTER =
connected component of the pair graph.  This is the standard last
step of web-scale dedup pipelines (the reference library has no text
layer; this feeds its filters a deduplicated key stream).

Algorithm: iterative min-label propagation with pointer-jumping.
Each round every node takes the min label over {self} ∪ neighbors
(one join + one groupBy on the EDGE table), then labels shortcut
through themselves (``comp := label[comp]`` — one join on the tiny
node table).  Propagation alone needs diameter(D) rounds; the
shortcut makes it O(log D).  Near-dup clusters are shallow (pairs
come from shared buckets), so 3-5 rounds converge in practice; the
loop stops at the first round with zero label changes and RAISES if
``max_iter`` rounds were not enough — silently-wrong components would
silently under-dedup.

Scale shape per round: the big join is edges ⋈ labels on the
neighbor key — both sides hash-partitioned on the same key, with the
groupBy(min) partially aggregated map-side; the label table is
node-sized (small relative to the corpus: only docs that appear in a
pair).  Lineage is cut with localCheckpoint every few rounds so the
iterative plan does not grow unboundedly (the classic Spark iterative-
algorithm failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "keep_cluster_representative"]


def connected_components(pairs: DataFrame, a_col: str, b_col: str,
                         max_iter: int = 25,
                         checkpoint_every: int = 4,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is
    the component's MINIMUM node id (deterministic canonical label).

    Lineage cuts: ``localCheckpoint`` by default (fast, blocks live on
    executors) — at cluster scale an executor loss after a local cut
    makes the iteration unrecoverable (the recompute path is severed),
    so long jobs should pass ``checkpoint_dir`` (an HDFS/S3/posix path)
    to get RELIABLE ``checkpoint()`` cuts that survive executor loss.

    Per-round cost: ONE action.  The previous label rides along as
    ``old_comp`` so convergence is a cheap filtered count over the
    already-materialized round result — no second labels join — and
    both the neighbor-min result (read twice by the pointer-jump
    self-reference) and the round result are persisted, so between
    lineage cuts each round's DAG is evaluated exactly once.
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = pairs.select(F.col(a_col).cast("long").alias("x"),
                         F.col(b_col).cast("long").alias("y"))
    edges = edges.where(F.col("x").isNotNull() & F.col("y").isNotNull())
    edges = (edges.union(edges.select(F.col("y").alias("x"),
                                      F.col("x").alias("y")))
             .distinct())
    edges = _cut(edges)

    labels = (edges.select(F.col("x").alias("node")).distinct()
              .withColumn("comp", F.col("node")))

    prev_cached: DataFrame | None = None
    for it in range(max_iter):
        # 1. neighbor-min: the smallest label any neighbor carries.
        # Persisted because the pointer-jump below references it on
        # BOTH join sides — without the persist Spark evaluates the
        # whole round plan twice.
        nbr = (edges.join(labels.select(F.col("node").alias("y"),
                                        F.col("comp").alias("ncomp")),
                          "y")
               .groupBy("x").agg(F.min("ncomp").alias("nbr_comp")))
        prop = (labels.join(nbr.select(F.col("x").alias("node"),
                                       "nbr_comp"), "node", "left")
                .select("node", F.col("comp").alias("old_comp"),
                        F.least("comp", F.coalesce("nbr_comp", "comp"))
                        .alias("comp"))
                .persist())
        # 2. pointer-jump: comp := label[comp]  (O(log D) convergence)
        jump = prop.select(F.col("node").alias("comp"),
                           F.col("comp").alias("jcomp"))
        new = (prop.join(jump, "comp", "left")
               .select("node", "old_comp",
                       F.least("comp", F.coalesce("jcomp", "comp"))
                       .alias("comp")))
        cut_this_round = (it + 1) % checkpoint_every == 0
        if cut_this_round:
            new = _cut(new)
        else:
            new = new.persist()
        # single action per round: materializes `new` AND derives the
        # convergence signal from the carried old label
        changed = new.where(F.col("comp") != F.col("old_comp")).count()
        prop.unpersist()
        if prev_cached is not None:
            prev_cached.unpersist()
        # a checkpointed frame must NOT be unpersisted (its lineage is
        # truncated; dropping the blocks would orphan it)
        prev_cached = None if cut_this_round else new
        labels = new.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large for the shortcutted propagation "
        "budget); raise max_iter — returning unconverged labels would "
        "silently under-dedup")


def keep_cluster_representative(df: DataFrame, pairs: DataFrame,
                                id_col: str, a_col: str, b_col: str,
                                invert: bool = False,
                                broadcast_losers: bool = True) -> DataFrame:
    """Drop every clustered document except its component's canonical
    (minimum-id) representative; rows in no pair are all kept
    (singletons are their own representative).  ``invert=True``
    returns the dropped duplicates instead.

    With ``broadcast_losers`` (default) the drop-list is broadcast
    against the full table and the corpus never shuffles — right
    whenever the duplicate fraction is broadcast-sized.  At extreme
    dup rates (a drop-list of 10^11 ids is NOT broadcastable) pass
    ``False`` for a plain shuffled anti join: one id-keyed exchange of
    8-byte keys, still no payload movement.
    """
    comps = connected_components(pairs, a_col, b_col)
    losers = comps.where(F.col("node") != F.col("comp")) \
        .select(F.col("node").alias(id_col))
    how = "left_semi" if invert else "left_anti"
    if broadcast_losers:
        losers = F.broadcast(losers)
    return df.join(losers, id_col, how)
