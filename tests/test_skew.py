"""Salted aggregation correctness + skew-spreading behavior."""

from pyspark.sql import functions as F

from fastfilter_spark.operators.skew import domain_of, domain_stats, salted_agg
from fastfilter_spark.sources.webpages import synthesize_webpages


def test_salted_agg_equals_unsalted(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_agg(
        li, ["l_returnflag"],
        {"n": ("count", "*"),
         "qty": ("sum", F.col("l_quantity").cast("long")),
         "maxp": ("max", F.col("l_extendedprice"))},
        n_salts=8)
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.max(F.col("l_extendedprice")).alias("maxp"))
    a = {r["l_returnflag"]: (r["n"], r["qty"], r["maxp"])
         for r in salted.collect()}
    b = {r["l_returnflag"]: (r["n"], r["qty"], r["maxp"])
         for r in plain.collect()}
    assert a == b


def test_domain_stats_on_skewed_webpages(spark):
    wp = synthesize_webpages(spark, 4000, seed=42)
    stats = domain_stats(wp, n_salts=8)
    rows = stats.collect()
    assert sum(r["n_pages"] for r in rows) == 4000
    top = max(rows, key=lambda r: r["n_pages"])
    assert top["n_pages"] > 4000 * 0.05  # the zipf head is present

    # oracle: plain aggregation
    plain = wp.select(domain_of(F.col("url")).alias("domain"),
                      F.length("text").alias("c")) \
        .groupBy("domain").agg(F.count("*").alias("n_pages"),
                               F.sum("c").alias("total_chars"),
                               F.max("c").alias("max_chars"))
    a = {r["domain"]: (r["n_pages"], r["total_chars"], r["max_chars"])
         for r in rows}
    b = {r["domain"]: (r["n_pages"], r["total_chars"], r["max_chars"])
         for r in plain.collect()}
    assert a == b


def test_salt_actually_spreads(spark):
    """Phase-1 output must contain multiple rows per hot key."""
    wp = synthesize_webpages(spark, 3000, seed=42)
    keyed = wp.select(domain_of(F.col("url")).alias("domain"))
    salted = keyed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(8)).cast("int"))
    hot = keyed.groupBy("domain").count().orderBy(F.desc("count")) \
        .first()["domain"]
    n_groups = salted.where(F.col("domain") == hot) \
        .select("_salt").distinct().count()
    assert n_groups >= 6  # hot key spread over >= 6 of 8 salt buckets
