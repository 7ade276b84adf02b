"""Regression tests for the round-2 code-review findings."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_SCHEMA = StructType([StructField("value", LongType(), False)])


def _feed(spark, maint, src, ckpt, lo, hi):
    spark.range(lo, hi).select((F.col("id") * 2654435761).alias("value")) \
        .coalesce(1).write.mode("append").parquet(src)
    q = (spark.readStream.schema(_SCHEMA).parquet(src).writeStream
         .foreachBatch(maint.process_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_stream_restart_with_fresh_checkpoint_not_stale(spark, tmp_path):
    """Review finding 1: batch ids reset to 0 when a stream re-attaches
    with a fresh checkpoint dir; latest-wins ordering must still serve
    the NEW shard rows (the log orders by a monotonic seq, not
    batch_id)."""
    from fastfilter_spark.streaming.incremental import (
        IncrementalFilterMaintainer)

    base = str(tmp_path / "inc")
    src = str(tmp_path / "src")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=2)
    # first run: several batches so batch_id advances past 0
    for lo, hi in ((0, 1000), (1000, 2000), (2000, 3000)):
        _feed(spark, maint, src, str(tmp_path / "ckptA"), lo, hi)

    # "restart": new maintainer instance, FRESH checkpoint dir, new src
    # (so the new stream re-delivers only new data, starting at batch 0)
    maint2 = IncrementalFilterMaintainer(base, key_col="value",
                                         kind="fuse8", shard_bits=2)
    src2 = str(tmp_path / "src2")
    _feed(spark, maint2, src2, str(tmp_path / "ckptB"), 3000, 4000)

    keys_df = spark.read.parquet(maint2.keys_dir)
    assert keys_df.count() == 4000
    sf = maint2.current_filter(spark)
    keys = np.array([r["key"] for r in keys_df.select("key").collect()],
                    dtype=np.int64)
    assert sf.contain_np(keys).all()  # incl. the post-restart keys
    # and still byte-identical to a from-scratch batch build
    from fastfilter_spark.operators.dist import build_sharded
    batch_sf, _ = build_sharded(keys_df, "key", kind="fuse8", shard_bits=2)
    assert batch_sf.payloads == sf.payloads


def test_compact_crash_recovery(spark, tmp_path):
    """Review finding 5: a compact() interrupted between its two renames
    leaves only the .compact.old snapshot; readers must heal it."""
    from fastfilter_spark.streaming.incremental import (
        IncrementalFilterMaintainer)

    base = str(tmp_path / "incc")
    src = str(tmp_path / "srcc")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=2)
    _feed(spark, maint, src, str(tmp_path / "ckptc"), 0, 2000)
    sf = maint.current_filter(spark)

    # simulate the crash window: table_dir renamed away, tmp not yet in
    os.rename(maint.table_dir, maint.table_dir + ".compact.old")
    assert not os.path.isdir(maint.table_dir)
    healed = maint.current_filter(spark)
    assert healed.payloads == sf.payloads


def test_compact_every_inline(spark, tmp_path):
    """compact_every runs inside the serial foreachBatch callback —
    race-free by construction — and keeps the resolved filter intact."""
    from fastfilter_spark.streaming.incremental import (
        IncrementalFilterMaintainer)

    base = str(tmp_path / "ince")
    src = str(tmp_path / "srce")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=2,
                                        compact_every=2)
    for lo, hi in ((0, 1000), (1000, 2000), (2000, 2500)):
        _feed(spark, maint, src, str(tmp_path / "ckpte"), lo, hi)
    rows = spark.read.parquet(maint.table_dir).count()
    assert rows <= 8  # 4 shards, compacted after batch 2 + <=1 round after
    keys = np.array([r["key"] for r in
                     spark.read.parquet(maint.keys_dir)
                     .select("key").collect()], dtype=np.int64)
    assert maint.current_filter(spark).contain_np(keys).all()


def test_bloom_probe_mirrors_string_hashing(spark, sf_dir):
    """Review finding 2: a Bloom built over a STRING column stores
    xxhash64 values; the distributed probe must apply the same JVM hash
    (raw probing would crash on strings or silently return false
    negatives)."""
    from fastfilter_spark.operators.sketch_agg import (
        bloom_contains_udf, bloom_sketch)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    bf = bloom_sketch(part, "p_name", fpp=0.01)
    assert bf.spark_hashed_input is True
    probe = bloom_contains_udf(bf, spark)
    names = part.select("p_name").distinct()
    assert names.where(probe(F.col("p_name"))).count() == names.count()

    # hashed long build: probe mirrors the hash instead of silently
    # probing raw ids (which would be ~100% false negatives)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bf2 = bloom_sketch(orders, "o_orderkey", fpp=0.01,
                       hash_strings_col=True)
    probe2 = bloom_contains_udf(bf2, spark)
    keys = orders.select("o_orderkey").distinct()
    assert keys.where(probe2(F.col("o_orderkey"))).count() == keys.count()


def test_salted_agg_spreads_identical_rows(spark, sf_dir):
    """Review finding 3: the canonical skewed count(*) over a
    single-column projection (all rows of a hot key byte-identical) must
    still fan out over multiple salts — and stay correct."""
    from fastfilter_spark.operators.skew import salted_agg

    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot"))
        .otherwise(F.lit("cold")).alias("k")).repartition(8)
    out = salted_agg(df, ["k"], {"n": ("count", "*")}, n_salts=8)
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, exact.collect()))
    # spreading: the hot key's phase-1 partials span >1 salt
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.lit(0x5A17), F.spark_partition_id(),
                                   F.col("k")), F.lit(8)).cast("int"))
    n_salts_hot = salted.where(F.col("k") == "hot") \
        .select("_salt").distinct().count()
    assert n_salts_hot > 1


def test_fuse_arity_inference_on_deserialize():
    """Review finding 4: the wire header carries no arity; from_bytes
    must infer it from the stored layout instead of silently mis-probing
    a 4-wise filter as 3-wise, and packed unpack must reject a wrong
    arity by the length identity."""
    from fastfilter_spark.operators.local import (
        FuseFilter, filter_from_bytes)

    keys = np.arange(50_000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    f4 = FuseFilter.build(keys, 8, arity=4)
    # kind-level helper with no arity argument: must come back 4-wise
    rt = filter_from_bytes(f4.to_bytes(), "fuse8")
    assert rt.arity == 4
    assert rt.contain(keys).all()
    # explicit contradiction fails loudly
    with pytest.raises(ValueError, match="contradicts"):
        FuseFilter.from_bytes(f4.to_bytes(), 8, arity=3)
    # packed: wrong arity breaks the exact length identity
    with pytest.raises(ValueError, match="arity"):
        FuseFilter.unpack(f4.pack(), 8, arity=3)
    up = FuseFilter.unpack(f4.pack(), 8, arity=4)
    assert up.contain(keys).all()


@pytest.mark.parametrize("n", [0, 1, 2, 4, 7])
def test_fuse_arity4_degenerate_sizes(n):
    """Review finding 6: arity-4 segment length formula goes negative
    for tiny sizes; the clamp must keep builds working down to size 0."""
    from fastfilter_spark.operators.local import FuseFilter

    keys = np.arange(n, dtype=np.uint64) * np.uint64(0xABCDEF12345)
    f = FuseFilter.build(keys, 8, arity=4)
    if n:
        assert f.contain(keys).all()
    probes = np.random.default_rng(5).integers(1 << 40, 1 << 62, 20_000,
                                               dtype=np.uint64)
    assert f.contain(probes).mean() <= 0.02 + (0.05 if n else 0.0)


def test_sharded_arity4_build_and_probe(spark, sf_dir):
    """arity=4 threads through the distributed build; probes need no
    flag (payload deserialization infers arity from the wire layout)."""
    from fastfilter_spark.operators.dist import build_sharded

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sf, table = build_sharded(li, "l_orderkey", kind="fuse8",
                              shard_bits=2, arity=4)
    keys = li.select("l_orderkey").distinct()
    n = keys.count()
    assert keys.where(sf.contains_udf(spark)(
        F.col("l_orderkey"))).count() == n
    # 4-wise shards are denser than 3-wise for the same keys
    sf3, _ = build_sharded(li, "l_orderkey", kind="fuse8", shard_bits=2)
    assert sf.size_in_bytes() < sf3.size_in_bytes()


def test_checkpoint_rejects_arity_mismatch(spark, sf_dir, tmp_path):
    """Resuming an arity-3 checkpoint with arity=4 must fail loudly
    (the schema has no arity column; payload layout inspection catches
    it) instead of producing a mixed-arity filter table."""
    from fastfilter_spark.operators.dist import build_sharded_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ck = str(tmp_path / "ck_arity")
    build_sharded_table(li, "l_orderkey", kind="fuse8", shard_bits=2,
                        checkpoint_dir=ck)
    with pytest.raises(ValueError, match="arity"):
        build_sharded_table(li, "l_orderkey", kind="fuse8", shard_bits=2,
                            checkpoint_dir=ck, arity=4)
    # argument errors fail on the driver before any job
    with pytest.raises(ValueError, match="fuse kinds"):
        build_sharded_table(li, "l_orderkey", kind="xor8", shard_bits=2,
                            arity=4)
