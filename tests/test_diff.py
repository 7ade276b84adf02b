"""corpus_diff: snapshot change classification."""
from pyspark.sql import functions as F

from fastfilter_spark.operators.diff import corpus_diff, diff_counts


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_four_statuses(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _snap(spark, [(2, "b"), (3, "C2"), (4, "d")])
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_counts_and_custom_fingerprint(spark):
    old = _snap(spark, [(1, "x"), (2, "y")])
    new = _snap(spark, [(1, "x"), (2, "z"), (3, "w")])
    counts = {r["status"]: r["n"]
              for r in diff_counts(old, new, "doc_id").collect()}
    assert counts == {"added": 1, "changed": 1, "unchanged": 1}
    # custom identity: length-only fingerprint makes 'z' == 'y'
    counts2 = {r["status"]: r["n"]
               for r in diff_counts(
                   old, new, "doc_id",
                   fingerprint=F.length("text").cast("string"))
               .collect()}
    assert counts2 == {"added": 1, "unchanged": 2}


def test_text_never_shuffles(spark):
    old = _snap(spark, [(1, "a" * 1000)])
    new = _snap(spark, [(1, "a" * 1000)])
    plan = (corpus_diff(old, new, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    # the join exchanges (id, fingerprint) projections — the text
    # column must be pruned before the Exchange
    import re
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0)


def test_empty_sides(spark):
    old = _snap(spark, [])
    new = _snap(spark, [(1, "a")])
    assert [(r["doc_id"], r["status"]) for r in
            corpus_diff(old, new, "doc_id").collect()] == [(1, "added")]
    assert corpus_diff(old, old, "doc_id").count() == 0


def test_null_text_documents_classified_by_presence(spark):
    # null text => null fingerprint; presence must come from the row,
    # not the fingerprint
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, None), (3, None)], "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id").collect()}
    assert got == {1: "unchanged",   # null == null content, both sides
                   2: "removed",     # only in old, despite null md5
                   3: "changed"}     # text -> null IS a content change


def test_null_ids_excluded_not_double_reported(spark):
    old = spark.createDataFrame([(None, "same"), (1, "x")],
                                "doc_id long, text string")
    new = spark.createDataFrame([(None, "same"), (1, "x")],
                                "doc_id long, text string")
    got = corpus_diff(old, new, "doc_id").collect()
    assert [(r["doc_id"], r["status"]) for r in got] == [(1, "unchanged")]
