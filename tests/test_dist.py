"""Distributed sharded-filter tests (local-mode Spark).

Mirrors the reference lifecycle assertions (tests/unit.c:38-101) at the
distributed layer: zero false negatives, fpp bound, byte-level
partition-order invariance, checkpoint resume, semi-join pruning
exactness.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.functions import kernels as K
from fastfilter_spark.operators.dist import (
    ShardedFilter, build_sharded, choose_shard_bits, semi_join_prune,
    shard_of_hash,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_choose_shard_bits():
    assert choose_shard_bits(1000) == 0
    assert choose_shard_bits(1 << 22) == 0
    assert choose_shard_bits((1 << 22) + 1) == 1
    assert choose_shard_bits(1 << 30) == 8
    assert choose_shard_bits(1 << 60) == 16  # capped


@pytest.mark.parametrize("kind,shard_bits", [("fuse8", 2), ("xor8", 1),
                                             ("fuse16", 0)])
def test_sharded_no_false_negatives(spark, lineitem, kind, shard_bits):
    sf, table = build_sharded(lineitem, "l_orderkey", kind=kind,
                              shard_bits=shard_bits)
    rows = table.collect()
    assert len(rows) == 1 << shard_bits
    # lineage sanity
    n_distinct = lineitem.select("l_orderkey").distinct().count()
    assert sum(r["distinct_keys"] for r in rows) == n_distinct
    assert sum(r["input_rows"] for r in rows) == lineitem.count()

    # zero false negatives, probed through the Spark UDF path
    probed = lineitem.select("l_orderkey").distinct() \
        .where(sf.contains_udf(spark)(F.col("l_orderkey"))).count()
    assert probed == n_distinct


def test_sharded_fpp_bound(spark, lineitem):
    sf, _ = build_sharded(lineitem, "l_orderkey", kind="fuse8", shard_bits=2)
    rng = np.random.default_rng(7)
    probes = rng.integers(1 << 40, 1 << 62, size=200_000, dtype=np.uint64)
    hits = int(sf.contain_np(probes).sum())
    fpp = hits / probes.size
    assert fpp <= (1 / 256) * 1.35  # 2^-8 with sampling slack


def test_partition_order_invariance(spark, lineitem):
    """Filter bytes must not depend on input partitioning/order
    (BASELINE.md merge/partition-order invariance target)."""
    a, _ = build_sharded(lineitem, "l_orderkey", kind="fuse8", shard_bits=2)
    shuffled = lineitem.orderBy(F.rand(seed=3)).repartition(13)
    b, _ = build_sharded(shuffled, "l_orderkey", kind="fuse8", shard_bits=2)
    assert a.payloads == b.payloads


def test_checkpoint_resume(spark, lineitem, tmp_path):
    ckpt = str(tmp_path / "filters")
    a, ta = build_sharded(lineitem, "l_orderkey", kind="fuse8", shard_bits=2,
                          checkpoint_dir=ckpt)
    # rerun: all shards present -> no rebuild, identical bytes
    b, tb = build_sharded(lineitem, "l_orderkey", kind="fuse8", shard_bits=2,
                          checkpoint_dir=ckpt)
    assert a.payloads == b.payloads
    assert tb.count() == 4

    # partial resume: drop shards 2,3 from the checkpoint, rebuild only those
    kept = spark.read.parquet(ckpt).where(F.col("shard") < 2)
    tmp2 = str(tmp_path / "filters2")
    kept.write.parquet(tmp2)
    c, tc = build_sharded(lineitem, "l_orderkey", kind="fuse8", shard_bits=2,
                          checkpoint_dir=tmp2)
    assert c.payloads == a.payloads


def test_semi_join_prune_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # dim = customers in nation < 10; filter over their keys
    dim = customer.where(F.col("c_nationkey") < 10) if \
        "c_nationkey" in customer.columns else customer.limit(50)
    sf, _ = build_sharded(dim, "c_custkey", kind="fuse8", shard_bits=1)
    pruned = semi_join_prune(orders, "o_custkey", sf, dim, "c_custkey")
    exact = orders.join(dim.select("c_custkey").distinct(),
                        orders["o_custkey"] == F.col("c_custkey"), "left_semi")
    assert pruned.count() == exact.count()


def test_shard_routing_matches_probe(spark):
    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
    shards = shard_of_hash(keys, 3)
    assert shards.min() >= 0 and shards.max() < 8
    # roughly uniform
    counts = np.bincount(shards, minlength=8)
    assert counts.min() > 10_000 / 8 * 0.8


def test_driver_and_udf_probe_agree(spark, lineitem):
    sf, _ = build_sharded(lineitem, "l_orderkey", kind="xor16", shard_bits=1)
    keys_df = lineitem.select("l_orderkey").distinct().limit(500)
    udf_rows = keys_df.withColumn(
        "hit", sf.contains_udf(spark)(F.col("l_orderkey"))).collect()
    keys = np.array([r["l_orderkey"] for r in udf_rows], dtype=np.int64)
    np_hits = sf.contain_np(keys)
    assert all(bool(r["hit"]) == bool(h) for r, h in zip(udf_rows, np_hits))
