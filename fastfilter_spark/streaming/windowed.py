"""Event-time windowed sketch aggregation with watermark-driven state
expiry.

The reference library is batch-only; this is the Structured-Streaming
shape for "distinct urls per 10-minute window, tolerating late events"
at web scale: the built-in ``window()`` buckets rows by event time, a
watermark bounds how late data may arrive, and the per-window state is
a MERGEABLE SKETCH (KBs) held in ``applyInPandasWithState`` rather than
the raw value set (which would be unbounded).  When the watermark
passes a window's close (+ allowed lateness) the state times out: the
operator emits one FINAL row for the window and drops the state — so
state size is proportional to open windows only, never to history.

Late rows beyond the watermark are dropped by Spark before the stateful
operator (standard watermark semantics); rows within the allowed
lateness merge into their window's sketch like any other.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from fastfilter_spark.functions.sketches import HyperLogLog

OUT_SCHEMA = StructType([
    StructField("window_start", LongType(), True),   # epoch seconds
    StructField("estimate", DoubleType(), False),
    StructField("n_rows", LongType(), False),
    StructField("final", IntegerType(), False),      # 1 = window closed
])
_STATE_SCHEMA = StructType([
    StructField("sketch", BinaryType(), True),       # HLL wire bytes
    StructField("n_rows", LongType(), True),
])


def _update_fn(p: int):
    def update(key: Tuple[Any, ...],
               batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        # key = (window struct, start epoch s, end epoch s).  The struct
        # must stay in the grouping key as a watermark-tagged timestamp
        # column (casting it away makes Spark reject EventTimeTimeout);
        # the epoch longs are cast JVM-side in the plan, so they are
        # timezone-correct — interpreting the struct's tz-NAIVE
        # session-zone datetimes via .timestamp() here would shift every
        # window bound by the session-UTC offset
        win_start = int(key[1])
        win_end_ms = int(key[2]) * 1000
        if state.hasTimedOut:
            # watermark passed window end: emit the final row, free state
            blob, n_rows = state.get
            hll = HyperLogLog.from_bytes(bytes(blob))
            state.remove()
            yield pd.DataFrame({"window_start": [win_start],
                                "estimate": [hll.estimate()],
                                "n_rows": [int(n_rows)], "final": [1]})
            return
        if state.exists:
            blob, n_rows = state.get
            hll = HyperLogLog.from_bytes(bytes(blob))
        else:
            hll, n_rows = HyperLogLog(p), 0
        for pdf in batches:
            vals = pdf["value"].dropna().to_numpy().astype(np.int64)
            if vals.size:
                hll.update(vals)
                n_rows += int(vals.size)
        state.update((hll.to_bytes(), int(n_rows)))
        # close the window once the event-time watermark passes its end
        state.setTimeoutTimestamp(win_end_ms)
        yield pd.DataFrame({"window_start": [win_start],
                            "estimate": [hll.estimate()],
                            "n_rows": [int(n_rows)], "final": [0]})

    return update


def windowed_hll_distinct(stream_df: DataFrame, ts_col: str, value_col: str,
                          window_duration: str = "10 minutes",
                          watermark_delay: str = "5 minutes",
                          p: int = 12) -> DataFrame:
    """Per-event-time-window approximate distinct counts over a stream.

    Returns a streaming DataFrame of ``OUT_SCHEMA`` rows: running
    (final=0) updates while a window is open, and exactly one final=1
    row when the watermark closes it.  ``value_col`` must be int64
    (hash strings JVM-side with ``F.xxhash64`` first — same rule as the
    batch sketch layer)."""
    win = F.window(F.col(ts_col), window_duration)
    keyed = (stream_df
             .withWatermark(ts_col, watermark_delay)
             .select(win.alias("win"),
                     F.col(value_col).cast("long").alias("value"))
             # drop nulls JVM-side (including cast failures): one null in
             # a micro-batch would turn the Arrow 'value' column float64
             # and round 64-bit hashes above 2^53 (same guard as
             # stateful.py / sketch_agg.py)
             .where(F.col("value").isNotNull())
             # epoch bounds computed JVM-side (timezone-correct); they
             # ride in the grouping key so the timeout branch — which
             # sees no input rows — still knows the window bounds
             .withColumn("win_start_s", F.col("win.start").cast("long"))
             .withColumn("win_end_s", F.col("win.end").cast("long")))
    return keyed.groupBy("win", "win_start_s", "win_end_s") \
        .applyInPandasWithState(
            _update_fn(p), OUT_SCHEMA, _STATE_SCHEMA,
            "update", GroupStateTimeout.EventTimeTimeout)
