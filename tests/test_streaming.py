"""Structured Streaming: incremental filter maintenance + streaming
sketches, driven by a bounded file stream with availableNow triggers
(deterministic micro-batches; a rate source would outpace the per-batch
rebuild on a test box)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from fastfilter_spark.functions.sketches import HyperLogLog, KLL
from fastfilter_spark.streaming.incremental import (
    IncrementalFilterMaintainer, StreamingSketchAggregator,
)

_SCHEMA = StructType([StructField("value", LongType(), False)])


def _write_batch(spark, src_dir: str, lo: int, hi: int):
    spark.range(lo, hi).select(
        (F.col("id") * 2654435761).alias("value")) \
        .coalesce(1).write.mode("append").parquet(src_dir)


def _run_once(spark, src_dir, ckpt, sink):
    stream = spark.readStream.schema(_SCHEMA).parquet(src_dir)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_incremental_filter_maintains_stream(spark, tmp_path):
    base = str(tmp_path / "inc")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=2)

    # three micro-batch rounds, each adding new keys
    for lo, hi in ((0, 3000), (3000, 5000), (5000, 6000)):
        _write_batch(spark, src, lo, hi)
        _run_once(spark, src, ckpt, maint.process_batch)

    keys_df = spark.read.parquet(maint.keys_dir)
    n = keys_df.count()
    assert n == 6000

    sf = maint.current_filter(spark)
    keys = np.array([r["key"] for r in keys_df.select("key").collect()],
                    dtype=np.int64)
    assert sf.contain_np(keys).all()          # zero false negatives
    rng = np.random.default_rng(5)
    probes = rng.integers(1 << 40, 1 << 62, 100_000, dtype=np.uint64)
    assert sf.contain_np(probes).mean() < 0.02

    # incremental result == from-scratch batch build over the same keys
    from fastfilter_spark.operators.dist import build_sharded
    batch_sf, _ = build_sharded(keys_df, "key", kind="fuse8", shard_bits=2)
    assert batch_sf.payloads == sf.payloads


def test_incremental_no_driver_payload_collect(spark, tmp_path):
    """VERDICT 'What's wrong' #3: a micro-batch must not collect filter
    payloads to the driver — only touched-shard IDs may cross.  Poison
    DataFrame.collect to record schemas and assert nothing with a
    payload column is ever collected, at shard_bits=8 (256 shards)."""
    from pyspark.sql import DataFrame

    base = str(tmp_path / "inc8")
    src = str(tmp_path / "src8")
    ckpt = str(tmp_path / "ckpt8")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=8)

    from tests.conftest import spy_collect
    collected_schemas = []
    with spy_collect(collected_schemas):
        for lo, hi in ((0, 2000), (2000, 3000)):
            _write_batch(spark, src, lo, hi)
            _run_once(spark, src, ckpt, maint.process_batch)

    assert all("payload" not in cols for cols in collected_schemas), \
        collected_schemas

    # correctness after the driver-free batches: latest-wins table,
    # zero false negatives, equal to a from-scratch batch build
    keys_df = spark.read.parquet(maint.keys_dir)
    sf = maint.current_filter(spark)
    keys = np.array([r["key"] for r in keys_df.select("key").collect()],
                    dtype=np.int64)
    assert sf.contain_np(keys).all()
    from fastfilter_spark.operators.dist import build_sharded
    batch_sf, _ = build_sharded(keys_df, "key", kind="fuse8", shard_bits=8)
    assert batch_sf.payloads == sf.payloads

    # the log holds >=1 row per touched shard per batch; compact() folds
    # it to exactly one per shard without changing the resolved filter
    n_log = spark.read.parquet(maint.table_dir).count()
    maint.compact(spark)
    n_compacted = spark.read.parquet(maint.table_dir).count()
    assert n_compacted <= 256 and n_compacted <= n_log
    assert maint.current_filter(spark).payloads == sf.payloads


def test_current_table_feeds_probe_via_join(spark, tmp_path):
    """The streaming filter is probe-able without ANY driver/broadcast
    materialization: current_table -> probe_via_join."""
    from fastfilter_spark.operators.dist import probe_via_join

    base = str(tmp_path / "incj")
    src = str(tmp_path / "srcj")
    maint = IncrementalFilterMaintainer(base, key_col="value",
                                        kind="fuse8", shard_bits=3)
    _write_batch(spark, src, 0, 4000)
    _run_once(spark, src, str(tmp_path / "ckptj"), maint.process_batch)

    keys_df = spark.read.parquet(maint.keys_dir).select("key")
    probed = probe_via_join(keys_df, "key", maint.current_table(spark))
    assert probed.where(~F.col("member")).count() == 0


def test_streaming_sketches(spark, tmp_path):
    src = str(tmp_path / "src2")
    state = str(tmp_path / "state")
    agg = StreamingSketchAggregator(
        "value", {"hll": lambda: HyperLogLog(12), "kll": lambda: KLL(200)},
        state_dir=state, as_float=False)

    _write_batch(spark, src, 0, 4000)
    _run_once(spark, src, str(tmp_path / "ck1"), agg.process_batch)
    _write_batch(spark, src, 4000, 6000)
    _run_once(spark, src, str(tmp_path / "ck1"), agg.process_batch)

    n = agg.sketches["kll"].n
    assert n == 6000
    est = agg.sketches["hll"].estimate()
    assert abs(est - 6000) / 6000 < 0.1       # all values distinct
    med = agg.sketches["kll"].quantile(0.5)
    svals = np.sort((np.arange(6000) * 2654435761).astype(np.int64))
    rank = np.searchsorted(svals, med) / 6000
    assert 0.45 <= rank <= 0.55

    # resumability: a fresh aggregator loads persisted sketch state
    agg2 = StreamingSketchAggregator(
        "value", {"hll": lambda: HyperLogLog(12), "kll": lambda: KLL(200)},
        state_dir=state)
    assert agg2.sketches["kll"].n == n
    assert agg2.sketches["hll"].estimate() == est


def test_sketch_aggregator_checkpoint_reset_fails_loudly(spark, tmp_path):
    """Review finding: batch ids restart at 0 when a stream re-attaches
    with a fresh checkpoint dir; silently skipping (old behavior of the
    batch_id <= last guard) would drop real data.  Redelivery of the
    LAST batch is still skipped; a rewind must raise."""
    state = str(tmp_path / "state_reset")
    df = spark.range(0, 100).select(F.col("id").alias("value"))
    agg = StreamingSketchAggregator(
        "value", {"kll": lambda: KLL(200)}, state_dir=state)
    agg.process_batch(df, 0)
    agg.process_batch(df, 1)
    n = agg.sketches["kll"].n
    assert n == 200
    # at-least-once redelivery of the newest batch: skipped, no change
    agg.process_batch(df, 1)
    assert agg.sketches["kll"].n == n
    # fresh-checkpoint restart against old state: loud error
    agg2 = StreamingSketchAggregator(
        "value", {"kll": lambda: KLL(200)}, state_dir=state)
    assert agg2.last_batch_id == 1
    with pytest.raises(ValueError, match="checkpoint"):
        agg2.process_batch(df, 0)


def test_sketch_aggregator_state_commit_is_atomic(spark, tmp_path):
    """Review finding: per-sketch state files replaced one by one let a
    mid-loop crash leave mixed state (some sketches with the last batch,
    the marker without).  State is now ONE file, so a crash before the
    final os.replace leaves the previous state fully intact."""
    state = str(tmp_path / "state_atomic")
    df = spark.range(0, 50).select(F.col("id").alias("value"))
    agg = StreamingSketchAggregator(
        "value", {"hll": lambda: HyperLogLog(12), "kll": lambda: KLL(200)},
        state_dir=state)
    agg.process_batch(df, 0)
    files = [f for f in os.listdir(state) if not f.startswith(".")]
    assert files == ["sketch_state.bin"]      # marker+blobs in one commit
    # a crash mid-save leaves only a tmp file; reload sees the old state
    with open(os.path.join(state, ".sketch_state.tmp"), "wb") as f:
        f.write(b"garbage half-written")
    agg2 = StreamingSketchAggregator(
        "value", {"hll": lambda: HyperLogLog(12), "kll": lambda: KLL(200)},
        state_dir=state)
    assert agg2.last_batch_id == 0
    assert agg2.sketches["kll"].n == 50


def test_streaming_ams_f2_fold(spark, tmp_path):
    """The round-4 AMS sketch composes with the streaming aggregator:
    two micro-batches fold to the BYTE-identical sketch a single batch
    fold produces (counter-additive merge), survive a restart from
    persisted state, and estimate the exact F2."""
    from fastfilter_spark.functions.sketches import AMS
    src = str(tmp_path / "src_ams")
    state = str(tmp_path / "state_ams")
    mk = lambda: AMS(width=256, depth=5)
    agg = StreamingSketchAggregator("value", {"f2": mk},
                                   state_dir=state, as_float=False)
    _write_batch(spark, src, 0, 3000)
    _run_once(spark, src, str(tmp_path / "ck_ams"), agg.process_batch)
    _write_batch(spark, src, 3000, 5000)
    _run_once(spark, src, str(tmp_path / "ck_ams"), agg.process_batch)

    vals = (np.arange(5000) * 2654435761).astype(np.int64)
    local = mk().update(vals)
    assert agg.sketches["f2"].to_bytes() == local.to_bytes()
    est = agg.sketches["f2"].estimate()
    # all values distinct -> exact F2 = n
    assert abs(est - 5000) <= 3 * 5000 * (2 / 256) ** 0.5

    # a fresh aggregator resumes from the persisted blob
    agg2 = StreamingSketchAggregator("value", {"f2": mk},
                                    state_dir=state)
    assert agg2.sketches["f2"].to_bytes() == local.to_bytes()
