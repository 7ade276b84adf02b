"""Structured Streaming integration.

The reference library is batch-only — a filter is immutable once
populated (no insert/delete; /root/reference/include/xorfilter.h:659,
binaryfusefilter.h:280) — so the streaming story is *incremental
rebuild*: maintain an up-to-date sharded filter over an append-only key
stream by rebuilding only the shards that received new keys each
micro-batch.  That keeps per-batch work proportional to touched shards
x shard size, not the total key count, and the result after any batch is
byte-identical to a from-scratch batch build over the same key set
(np.unique in the shard kernel makes bytes order-invariant).

Also provided: streaming sketch aggregation via ``foreachBatch`` — each
micro-batch folds into mergeable sketches (functions/sketches.py), the
classic monoid pattern that Structured Streaming cannot express with
built-in aggregates.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from fastfilter_spark.operators.dist import (
    FILTER_TABLE_SCHEMA, ShardedFilter, build_filter_rows, keys_with_shard,
)


class IncrementalFilterMaintainer:
    """foreachBatch sink keeping a sharded filter current over a key stream.

    State = the checkpointed filter table (parquet, one row per shard)
    plus per-shard key stores (parquet of raw keys, partitioned by shard).
    A micro-batch appends its keys to the key store, then rebuilds ONLY
    the shards it touched from their full key sets.  Shards untouched by
    the batch keep their previous rows — lineage (seed, build_ms,
    distinct_keys) stays per-shard accurate.
    """

    def __init__(self, base_dir: str, key_col: str = "key",
                 kind: str = "fuse8", shard_bits: int = 4):
        self.base_dir = base_dir
        self.key_col = key_col
        self.kind = kind
        self.shard_bits = shard_bits
        self.keys_dir = os.path.join(base_dir, "keys")
        self.table_dir = os.path.join(base_dir, "filters")

    # -- foreachBatch entry ----------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        keyed = keys_with_shard(batch_df, self.key_col, self.shard_bits)
        if keyed.isEmpty():
            return
        keyed.write.mode("append").partitionBy("shard").parquet(self.keys_dir)
        touched = [r["shard"] for r in keyed.select("shard").distinct().collect()]

        # rebuild touched shards from their full key history (partition
        # pruning: the key store is partitioned by shard, so untouched
        # shards are never read)
        store = spark.read.parquet(self.keys_dir) \
            .where(F.col("shard").isin([int(s) for s in touched]))
        rebuilt = build_filter_rows(store, self.kind, 1 << self.shard_bits)
        rebuilt_rows = {r["shard"]: r for r in rebuilt.collect()}

        # merge with previous table (untouched shards carry over)
        prev = {}
        try:
            for r in spark.read.schema(FILTER_TABLE_SCHEMA) \
                    .parquet(self.table_dir).collect():
                prev[r["shard"]] = r
        except Exception:
            pass
        prev.update(rebuilt_rows)
        # collect() above materialized everything on the driver, so the
        # overwrite of the directory we just read from is safe
        spark.createDataFrame([r.asDict() for r in prev.values()],
                              FILTER_TABLE_SCHEMA) \
            .write.mode("overwrite").parquet(self.table_dir)

    # -- reads ------------------------------------------------------------

    def current_filter(self, spark: SparkSession) -> ShardedFilter:
        if not os.path.isdir(self.table_dir):
            raise ValueError(
                f"no micro-batch has been processed yet ({self.table_dir} "
                "does not exist); attach() the stream first")
        rows = spark.read.schema(FILTER_TABLE_SCHEMA) \
            .parquet(self.table_dir).collect()
        present = {r["shard"] for r in rows}
        num_shards = 1 << self.shard_bits
        if len(present) < num_shards:
            # shards with no keys yet: fill with a valid empty filter
            # (works for every kind — see local.empty_filter)
            from fastfilter_spark.operators.local import empty_filter
            payload = empty_filter(self.kind).to_bytes()
            filler = [
                {"shard": s, "kind": self.kind, "num_shards": num_shards,
                 "input_rows": 0, "distinct_keys": 0, "seed": 0,
                 "size_bytes": len(payload), "build_ms": 0.0,
                 "payload": payload}
                for s in range(num_shards) if s not in present]
            rows = list(rows) + filler
        return ShardedFilter.from_filter_table(
            [r if isinstance(r, dict) else r.asDict() for r in rows])

    def attach(self, stream_df: DataFrame, checkpoint: str | None = None):
        """writeStream wiring: returns the started StreamingQuery."""
        return (stream_df.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation",
                        checkpoint or os.path.join(self.base_dir, "ckpt"))
                .outputMode("update")
                .start())


class StreamingSketchAggregator:
    """foreachBatch sink folding a stream into mergeable sketches.

    ``factories`` maps sketch name -> zero-arg constructor; each batch
    updates every sketch with the batch's column values (sketch classes
    are commutative monoids, so the result is the same as a batch
    aggregation over the whole stream so far).  Sketch state is
    checkpointed as wire bytes per batch for resumability.
    """

    def __init__(self, col: str, factories: dict[str, Callable[[], object]],
                 state_dir: str | None = None, as_float: bool = False):
        self.col = col
        self.factories = factories
        self.state_dir = state_dir
        self.as_float = as_float
        self.sketches = {name: f() for name, f in factories.items()}
        self.last_batch_id = -1
        if state_dir:
            self._load()

    def _load(self):
        from fastfilter_spark.functions.sketches import sketch_from_bytes
        for name in self.factories:
            path = os.path.join(self.state_dir, f"{name}.bin")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    self.sketches[name] = sketch_from_bytes(f.read())
        marker = os.path.join(self.state_dir, "last_batch_id")
        if os.path.exists(marker):
            with open(marker) as f:
                self.last_batch_id = int(f.read().strip())

    def _save(self, batch_id: int):
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        for name, sk in self.sketches.items():
            tmp = os.path.join(self.state_dir, f".{name}.tmp")
            with open(tmp, "wb") as f:
                f.write(sk.to_bytes())
            os.replace(tmp, os.path.join(self.state_dir, f"{name}.bin"))
        tmp = os.path.join(self.state_dir, ".last_batch_id.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.state_dir, "last_batch_id"))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a batch re-delivered after a
        # crash between our _save and Spark's checkpoint commit must not
        # double-count into the (add-semantics) sketches
        if batch_id <= self.last_batch_id:
            return
        rows = batch_df.select(self.col).dropna().collect()
        if rows:
            vals = np.array([r[0] for r in rows],
                            dtype=np.float64 if self.as_float else np.int64)
            for sk in self.sketches.values():
                sk.update(vals)
        self.last_batch_id = batch_id
        self._save(batch_id)

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (stream_df.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint)
                .outputMode("update")
                .start())
