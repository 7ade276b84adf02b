"""BM25 ranked retrieval (operators/ranking.py)."""

import math

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.ranking import bm25_scores, bm25_topk

_DOCS = [
    (1, "spark filter spark table"),          # spark x2, filter x1, dl 4
    (2, "stream stream stream stream"),       # stream x4, dl 4
    (3, "table scan row value batch merge"),  # no query terms, dl 6
    (4, "filter"),                            # filter x1, dl 1
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    """Independent python replay of the documented formula."""
    toks = {i: t.split() for i, t in corpus}
    dl = {i: len(ts) for i, ts in toks.items() if ts}
    n, sumdl = len(dl), sum(dl.values())
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for term in sorted(set(terms)):
            tf = ts.count(term)
            if not tf:
                continue
            df = sum(term in v for v in toks.values())
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            rel = (dl[i] * n) / sumdl
            s += idf * ((tf * (k1 + 1.0))
                        / (tf + k1 * ((1.0 - b) + b * rel)))
        if s:
            out[i] = s
    return out


def test_bm25_scores_match_reference_formula(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r.doc_id: r.score for r in
           bm25_scores(df, ["spark", "filter", "stream"]).collect()}
    want = _py_bm25(_DOCS, ["spark", "filter", "stream"])
    assert set(got) == set(want)          # doc 3 absent (no query term)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_rank_order_and_k(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    want = _py_bm25(_DOCS, ["spark", "filter", "stream"])
    order = sorted(want, key=lambda i: (-want[i], i))
    got = bm25_topk(df, ["spark", "filter", "stream"], k=2) \
        .orderBy("rank").collect()
    assert [(r.rank, r.doc_id) for r in got] == \
        [(1, order[0]), (2, order[1])]


def test_bm25_case_folding_and_validation(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    up = {r.doc_id: r.score for r in
          bm25_scores(df, ["SPARK", "Spark"]).collect()}
    lo = {r.doc_id: r.score for r in
          bm25_scores(df, ["spark"]).collect()}
    assert up == lo
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])


def test_bm25_plan_stays_jvm_side(spark):
    """No python row UDFs anywhere; the df side of the tf join is
    broadcast (it is <= |query| rows)."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = bm25_topk(df, ["spark", "stream"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
