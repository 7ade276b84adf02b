"""pmi_collocations and leakage_safe_split."""
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.collocations import pmi_collocations
from fastfilter_spark.operators.splits import (
    leakage_safe_split, split_column)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_collocations_exact_counts_and_order(spark):
    # "new york" appears 3x; "the cat" 2x; tokens lower-cased.
    docs = _docs(spark, [
        "New York is big. The cat sat.",
        "I love New York and the cat.",
        "New York wins",
    ])
    got = pmi_collocations(docs, min_count=2, top_k=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in got}
    ny = by_pair[("new", "york")]
    assert (ny["c_pair"], ny["c1"], ny["c2"]) == (3, 3, 3)
    tc = by_pair[("the", "cat")]
    assert (tc["c_pair"], tc["c1"], tc["c2"]) == (2, 2, 2)
    # lift = c_pair * T * 1e6 div (c1*c2); T = total bigram count
    total = docs.select(F.explode(F.filter(
        F.split(F.lower("text"), r"[^a-z]+"), lambda x: x != ""))).count()
    # bigram total = token total - n_docs (each doc with >=1 token
    # contributes len-1 bigrams; all three docs have >= 2 tokens)
    T = total - 3
    assert ny["lift_ppm"] == (3 * T * 1_000_000) // 9
    assert tc["lift_ppm"] == (2 * T * 1_000_000) // 4
    # the rarer-word pair has higher lift -> rank 1
    assert by_pair[("the", "cat")]["rank"] < by_pair[("new", "york")]["rank"]
    # ranks are 1..n dense
    assert sorted(r["rank"] for r in got) == list(range(1, len(got) + 1))


def test_collocations_min_count_prunes(spark):
    docs = _docs(spark, ["alpha beta", "alpha beta", "gamma delta"])
    got = pmi_collocations(docs, min_count=2, top_k=10).collect()
    assert {(r["w1"], r["w2"]) for r in got} == {("alpha", "beta")}


def test_collocations_short_docs_and_validation(spark):
    docs = _docs(spark, ["one", "", "a b"])
    got = pmi_collocations(docs, min_count=1, top_k=5).collect()
    assert {(r["w1"], r["w2"]) for r in got} == {("a", "b")}
    with pytest.raises(ValueError):
        pmi_collocations(docs, min_count=0)
    with pytest.raises(ValueError):
        pmi_collocations(docs, top_k=0)


def test_split_group_constant_and_fractions(spark):
    n = 2000
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("site"), (F.col("id") % 500)).alias("domain"))
    out = leakage_safe_split(df, "domain")
    # every group entirely on one side
    assert (out.groupBy("domain")
            .agg(F.countDistinct("split").alias("k"))
            .where("k > 1").count()) == 0
    # rough fraction sanity over 500 groups (binomial, wide bars)
    frac = {r["split"]: r["c"] for r in
            out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert frac["train"] > 0.8 * n
    assert 0 < frac.get("val", 0) < 0.15 * n
    assert 0 < frac.get("test", 0) < 0.15 * n


def test_split_deterministic_and_salt_sensitive(spark):
    df = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("g"))
    a = {r["g"]: r["split"] for r in
         leakage_safe_split(df, "g").collect()}
    b = {r["g"]: r["split"] for r in
         leakage_safe_split(df, "g").collect()}
    assert a == b
    c = {r["g"]: r["split"] for r in
         leakage_safe_split(df, "g", salt="other").collect()}
    assert a != c  # 300 groups all landing identically is ~impossible


def test_split_validation(spark):
    df = spark.range(3).select(F.col("id").alias("g"))
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, "g", fractions={"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="> 0"):
        leakage_safe_split(df, "g", fractions={"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="already exists"):
        leakage_safe_split(df.withColumn("split", F.lit("x")), "g")
    with pytest.raises(ValueError, match="non-empty"):
        split_column(F.col("g"), {})


def test_split_single_label_and_plan_is_projection(spark):
    df = spark.range(10).select(F.col("id").alias("g"))
    out = leakage_safe_split(df, "g", fractions={"all": 1.0})
    assert out.where("split != 'all'").count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection, zero shuffle


def test_split_null_group_gets_null_label(spark):
    rows = [(1, "a.com"), (2, None), (3, "b.com")]
    df = spark.createDataFrame(rows, "id long, g string")
    got = {r["id"]: r["split"] for r in
           leakage_safe_split(df, "g").collect()}
    assert got[2] is None
    assert got[1] is not None and got[3] is not None


def test_split_rounding_overage_rejected(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("g"))
    # ppm rounding sums to 1_000_001: the last label's bucket would be
    # unreachable — must raise, not silently ship an empty split
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, "g", fractions={
            "train": 0.999999, "val": 0.000001, "test": 0.000001})
    # a 1ppm DEFICIT (1/3 three ways) is fine: last label absorbs it
    out = leakage_safe_split(df, "g", fractions={
        "a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert out.where("split IS NULL").count() == 0


def test_collocations_out_of_regime_corpus_fails_loudly(spark, monkeypatch):
    import fastfilter_spark.operators.collocations as C
    # shrink the exact-BIGINT regime so a toy corpus exceeds it
    monkeypatch.setattr(C, "LIFT_SCALE", 2 ** 62)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string")
    with pytest.raises(Exception) as ei:
        C.pmi_collocations(docs, min_count=2, top_k=5).collect()
    assert "exceeds the exact-BIGINT lift regime" in str(ei.value)


def test_split_accepts_exact_sum_fractions_many_labels(spark):
    # per-label rounding used to reject these genuinely-sum-1 dicts
    df = spark.range(50).select(F.col("id").cast("string").alias("g"))
    for fr in ({"a": 0.2000005, "b": 0.2000005, "c": 0.2000005,
                "d": 0.2000005, "e": 0.199998},
               {"a": 0.3333335, "b": 0.3333335, "c": 0.333333}):
        out = leakage_safe_split(df, "g", fractions=fr)
        assert out.where("split IS NULL").count() == 0
