"""Custom stateful streaming operator: per-key running sketches via
``applyInPandasWithState``.

``foreachBatch`` (streaming/incremental.py) folds a whole stream into
ONE global sketch; this module keeps an *arbitrary-cardinality keyed*
sketch state inside Structured Streaming's state store — e.g. a running
distinct-url count per domain over a page stream.  The state value is
the sketch's wire format (functions/sketches.py), so state survives
checkpoint/restart and stays mergeable.

This is the Spark-idiomatic shape for stateful operators the built-in
aggregates can't express (a distinct-count per key needs either a full
dedup shuffle per trigger or a mergeable sketch in state — at web scale
only the sketch works).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from fastfilter_spark.functions.sketches import HyperLogLog

def _out_schema(key_type) -> StructType:
    # the output key field mirrors the INPUT key column's type — a fixed
    # StringType here would make every non-string key (e.g. bigint
    # domain ids) die at the pandas->Arrow boundary in each task
    return StructType([
        StructField("key", key_type, True),
        StructField("estimate", DoubleType(), False),
        StructField("n_updates", LongType(), False),
    ])
_STATE_SCHEMA = StructType([
    StructField("sketch", StringType(), True),   # hex wire bytes
    StructField("n_updates", LongType(), True),
])


def _update_fn(p: int):
    def update(key: Tuple[Any, ...],
               batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob_hex, n_updates = state.get
            hll = HyperLogLog.from_bytes(bytes.fromhex(blob_hex))
        else:
            hll, n_updates = HyperLogLog(p), 0
        for pdf in batches:
            vals = pdf["value"].dropna().to_numpy().astype(np.int64)
            if vals.size:
                hll.update(vals)
                n_updates += int(vals.size)
        state.update((hll.to_bytes().hex(), n_updates))
        yield pd.DataFrame({"key": [key[0]],
                            "estimate": [hll.estimate()],
                            "n_updates": [n_updates]})

    return update


def running_distinct_per_key(stream: DataFrame, key_col: str,
                             value_col: str, p: int = 12) -> DataFrame:
    """(key, estimate, n_updates) updated per micro-batch; per-key HLL
    state lives in the streaming state store.

    ``value_col`` must be a 64-bit key column (hash strings upstream,
    e.g. ``F.xxhash64``); output estimate is the running distinct count
    of values seen for the key since the stream started.
    """
    # drop nulls JVM-side: a null reaching pandas turns the long column
    # into float64, corrupting 64-bit hash values above 2^53
    keyed = stream.selectExpr(f"{key_col} AS key",
                              f"CAST({value_col} AS LONG) AS value") \
        .dropna(subset=["value"])
    key_type = keyed.schema["key"].dataType
    return keyed.groupBy("key").applyInPandasWithState(
        _update_fn(p), outputStructType=_out_schema(key_type),
        stateStructType=_STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
