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

__all__ = ["connected_components", "keep_cluster_representative",
           "pagerank"]


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
    # don't leak the last round's cached frame into the caller's
    # session on the failure path (the success path hands its cache to
    # the caller as the result's backing store)
    if prev_cached is not None:
        prev_cached.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large for the shortcutted propagation "
        "budget); raise max_iter — returning unconverged labels would "
        "silently under-dedup")


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             nodes: DataFrame | None = None, node_col: str = "node",
             iterations: int = 3, damping_pct: int = 85,
             scale: int = 10**9,
             checkpoint_every: int = 4,
             checkpoint_dir: str | None = None) -> DataFrame:
    """Integer-exact PageRank over a link graph: (node, rank) after
    ``iterations`` synchronous power-iteration rounds, where ``rank``
    is a fixed-point BIGINT in units of ``1/scale`` (initial rank =
    ``scale``).  The web-graph companion to the membership filters: a
    Common-Crawl-style corpus ranks its url nodes by link structure to
    prioritise crawl / weight training data.

    ALL arithmetic is exact integer — per-edge contribution is
    ``rank div out_degree`` (64-bit), and the contribution sum plus
    the damping product ``(damping_pct*sum) div 100`` run in
    DECIMAL(38,0) (a hub with ~1e8 full-rank in-links pushes the
    pre-division product past 2^63 even though the final rank fits a
    long) before the update lands back in BIGINT — so the result is
    bit-identical under ANY partitioning or iteration order (integer
    sums are associative+commutative; float PageRank is famously not
    reproducible across partition counts).
    That makes the operator oracle-checkable by exact hash and its
    output stable across cluster sizes.  Rounding note: fixed-point
    truncation loses < 1 unit (1e-9) per edge per round vs exact
    rationals — negligible against the ranking's purpose and fully
    deterministic.  Dangling nodes (no out-links) leak their mass,
    the common large-graph simplification; redistributing it costs
    one extra agg per round and is omitted here.

    Scale shape: the edge table is the big side — it is hash-
    partitioned on ``src`` ONCE, persisted, and every round's
    rank-join reuses that layout, so only the node-sized rank table
    (8+8 bytes a row) moves per round: one shuffle of ranks to the
    edge partitioning, one map-side-combined groupBy(dst), one left
    join back onto the node table.  Lineage is cut every
    ``checkpoint_every`` rounds (same reliable-vs-local checkpoint
    choice as :func:`connected_components`).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    e = e.where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if nodes is not None:
        node_df = nodes.select(F.col(node_col).cast("long")
                               .alias("node")).distinct()
    else:
        node_df = (e.select(F.col("src").alias("node"))
                   .union(e.select(F.col("dst").alias("node")))
                   .distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the big, loop-invariant side: partitioned by the join key once,
    # persisted — each round's join reuses this layout instead of
    # re-exchanging the edge table (the dominant cost at web scale)
    e_deg = (e.join(deg, "src")
             .repartition(F.col("src"))
             .persist())
    node_df = _cut(node_df.repartition(F.col("node")))

    base = (100 - damping_pct) * scale // 100
    ranks = node_df.withColumn("rank", F.lit(scale).cast("long"))
    prev_cached: DataFrame | None = None
    for it in range(iterations):
        # csum and the damping product run in DECIMAL(38,0): a hub with
        # ~10^8 full-rank in-links pushes damping_pct * csum past 2^63
        # (ANSI abort) even though the final rank fits in a long — same
        # idiom as kmv/moments/sampling for exact integer products.
        contrib = (e_deg.join(ranks.select(F.col("node").alias("src"),
                                           "rank"), "src")
                   .select("dst", F.expr("CAST(rank div deg "
                                         "AS DECIMAL(38,0))").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("csum")))
        new = (node_df.join(contrib.select(F.col("dst").alias("node"),
                                           "csum"), "node", "left")
               .select("node",
                       (F.lit(base).cast("long")
                        + F.expr(f"CAST(({damping_pct} * coalesce(csum, "
                                 "CAST(0 AS DECIMAL(38,0)))) DIV 100 "
                                 "AS BIGINT)")).alias("rank")))
        cut_this_round = (it + 1) % checkpoint_every == 0
        new = _cut(new) if cut_this_round else new.persist()
        new.count()  # materialize before dropping the previous round
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = None if cut_this_round else new
        ranks = new
    # the loop-invariant edge layout is dead once iteration ends; the
    # returned rank frame is already materialized (each round counts),
    # so dropping e_deg's blocks cannot trigger a recompute surprise —
    # without this, every pagerank() call leaks an executor-storage
    # copy of the big side for the life of the session.  The FINAL
    # rank cache intentionally survives as the result's backing store;
    # callers that are done with it unpersist the returned frame.
    e_deg.unpersist()
    return ranks.select("node", "rank")


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
