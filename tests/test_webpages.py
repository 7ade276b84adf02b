"""Webpages source: determinism, shape, extraction invariant, end-to-end
filter build over urls (the input_hint pipeline)."""

from pyspark.sql import functions as F

from fastfilter_spark.operators.dist import build_sharded
from fastfilter_spark.sources.webpages import (
    extraction_mismatch_count, synthesize_webpages, url_keys,
)


def test_schema_and_shape(spark):
    df = synthesize_webpages(spark, 2000, seed=42)
    assert [f.name for f in df.schema.fields] == \
        ["url", "warc_ts", "html", "text", "lang"]
    assert df.count() == 2000
    assert df.select("url").distinct().count() == 2000


def test_deterministic_across_partitionings(spark):
    a = synthesize_webpages(spark, 1500, seed=42, partitions=2)
    b = synthesize_webpages(spark, 1500, seed=42, partitions=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_extraction_byte_identical(spark):
    df = synthesize_webpages(spark, 3000, seed=42)
    assert extraction_mismatch_count(df) == 0


def test_lang_distribution_en_heavy(spark):
    df = synthesize_webpages(spark, 5000, seed=42)
    top = df.groupBy("lang").count().orderBy(F.desc("count")).first()
    assert top["lang"] == "en"


def test_domain_skew_present(spark):
    df = synthesize_webpages(spark, 5000, seed=42)
    dom = df.select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("d"))
    top_share = dom.groupBy("d").count().orderBy(F.desc("count")) \
        .first()["count"] / 5000
    assert top_share > 0.05  # hot prefix exists (zipf head)


def test_duplicates_then_filter_build(spark):
    df = synthesize_webpages(spark, 3000, seed=42, duplicate_fraction=0.2)
    assert df.count() == 3600
    keys = url_keys(df)
    sf, table = build_sharded(keys, "key", kind="fuse8", shard_bits=1)
    rows = table.collect()
    assert sum(r["distinct_keys"] for r in rows) == 3000
    # zero false negatives over the urls
    n = keys.distinct().where(sf.contains_udf(spark)(F.col("key"))).count()
    assert n == 3000
