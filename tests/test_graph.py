"""Connected components + cluster-representative dedup."""

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.graph import (
    connected_components, keep_cluster_representative,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def _comps(spark, edges, **kw):
    out = connected_components(_pairs(spark, edges), "a", "b", **kw)
    return {r.node: r.comp for r in out.collect()}


def test_components_basic_shapes(spark):
    got = _comps(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_components_long_path_needs_pointer_jumping(spark):
    """A 24-node path has diameter 23; plain propagation would need 23
    rounds — the shortcut must converge well inside max_iter=10."""
    edges = [(i, i + 1) for i in range(23)]
    got = _comps(spark, edges, max_iter=10)
    assert set(got.values()) == {0}
    assert len(got) == 24


def test_components_star_and_cycle(spark):
    edges = [(100, i) for i in range(5)] + [(7, 8), (8, 9), (9, 7)]
    got = _comps(spark, edges)
    assert {got[i] for i in [100, 0, 1, 2, 3, 4]} == {0}
    assert {got[i] for i in [7, 8, 9]} == {7}


def test_components_unconverged_raises(spark):
    edges = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, edges), "a", "b", max_iter=2)


def test_keep_cluster_representative(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)],
                                 "doc_id long, text string")
    pairs = _pairs(spark, [(1, 3), (3, 5), (6, 7)])
    kept = keep_cluster_representative(docs, pairs, "doc_id", "a", "b")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2, 4, 6]
    dropped = keep_cluster_representative(docs, pairs, "doc_id", "a",
                                          "b", invert=True)
    assert sorted(r.doc_id for r in dropped.collect()) == [3, 5, 7]


def test_empty_pairs_keep_everything(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(5)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([], "a long, b long")
    kept = keep_cluster_representative(docs, pairs, "doc_id", "a", "b")
    assert kept.count() == 5


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def test_sessionize_hand_computed(spark):
    from fastfilter_spark.operators.sessions import sessionize
    rows = [
        # user 1: events at t=0, 100, 2000 (gap>1800 -> new), 2100
        (1, 0.0, 10), (1, 100.0, 11), (1, 2000.0, 12), (1, 2100.0, 13),
        # user 2: single event
        (2, 50.0, 20),
        # user 3: exactly gap apart stays SAME session (strict >)
        (3, 0.0, 30), (3, 1800.0, 31), (3, 3601.0, 32),
    ]
    df = spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows],
        "user_id long, ts double, event_id long")
    out = sessionize(df, "user_id", "ts", gap_seconds=1800.0,
                     tiebreak_col="event_id")
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {10: 1, 11: 1, 12: 2, 13: 2, 20: 1,
                   30: 1, 31: 1, 32: 2}


def test_sessionize_rejects_column_collision(spark):
    from fastfilter_spark.operators.sessions import sessionize
    df = spark.createDataFrame([(1, 0.0, 1)],
                               "user_id long, ts double, session_idx long")
    import pytest as _pt
    with _pt.raises(ValueError, match="session_idx"):
        sessionize(df, "user_id", "ts")


# ---------------------------------------------------------------- pagerank

def _py_pagerank(edges, nodes, iterations=3, damping_pct=85, scale=10**9):
    """Pure-python integer replay of operators.graph.pagerank."""
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: scale for v in nodes}
    base = (100 - damping_pct) * scale // 100
    for _ in range(iterations):
        csum = {}
        for s, d in edges:
            if s in rank:
                csum[d] = csum.get(d, 0) + rank[s] // deg[s]
        rank = {v: base + damping_pct * csum.get(v, 0) // 100
                for v in nodes}
    return rank


def _spark_pagerank(spark, edges, nodes=None, **kw):
    from fastfilter_spark.operators.graph import pagerank
    e = spark.createDataFrame(edges, "s long, d long")
    nd = (spark.createDataFrame([(v,) for v in nodes], "node long")
          if nodes is not None else None)
    out = pagerank(e, "s", "d", nodes=nd, **kw)
    return {r.node: r.rank for r in out.collect()}


def test_pagerank_matches_pure_python_replay(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (2, 4)]
    nodes = [0, 1, 2, 3, 4]
    got = _spark_pagerank(spark, edges, nodes)
    assert got == _py_pagerank(edges, nodes)
    # the hub (2) must outrank the leaf that nothing links to (3)
    assert got[2] > got[3]


def test_pagerank_dangling_and_isolated_nodes(spark):
    # 3 has no out-links (dangling: leaks mass); 9 is fully isolated
    edges = [(0, 3), (1, 3), (2, 3)]
    nodes = [0, 1, 2, 3, 9]
    got = _spark_pagerank(spark, edges, nodes)
    exp = _py_pagerank(edges, nodes)
    assert got == exp
    base = 15 * 10**7
    assert got[9] == base  # isolated: base rank only
    assert got[3] > got[0] == got[1] == got[2] == base


def test_pagerank_partitioning_invariance(spark):
    """Integer fixed-point ranks are bit-identical under any
    partitioning — the property float PageRank lacks."""
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = list(range(40))
    a = _spark_pagerank(spark, edges, nodes)
    from fastfilter_spark.operators.graph import pagerank
    e = (spark.createDataFrame(edges, "s long, d long")
         .repartition(13))
    nd = spark.createDataFrame([(v,) for v in nodes], "node long") \
        .repartition(3)
    out = pagerank(e, "s", "d", nodes=nd, iterations=3,
                   checkpoint_every=2)
    b = {r.node: r.rank for r in out.collect()}
    assert a == b == _py_pagerank(edges, nodes)


def test_pagerank_zero_iterations_and_validation(spark):
    got = _spark_pagerank(spark, [(0, 1)], [0, 1], iterations=0)
    assert got == {0: 10**9, 1: 10**9}
    from fastfilter_spark.operators.graph import pagerank
    e = spark.createDataFrame([(0, 1)], "s long, d long")
    with pytest.raises(ValueError):
        pagerank(e, "s", "d", iterations=-1)
    with pytest.raises(ValueError):
        pagerank(e, "s", "d", damping_pct=101)


def test_pagerank_default_node_set_is_edge_endpoints(spark):
    edges = [(5, 6), (6, 7)]
    got = _spark_pagerank(spark, edges)  # nodes inferred
    assert set(got) == {5, 6, 7}
    assert got == _py_pagerank(edges, [5, 6, 7])
