"""Event-time windowed sketch aggregation: watermark close-out, late-data
handling, state expiry (streaming/windowed.py)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

from fastfilter_spark.streaming.windowed import windowed_hll_distinct

_SCHEMA = StructType([
    StructField("ts", TimestampType(), False),
    StructField("value", LongType(), False),
])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, src, rows):
    spark.createDataFrame(
        [(T0 + dt.timedelta(seconds=s), int(v)) for s, v in rows], _SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, ckpt, out_rows):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    windowed = windowed_hll_distinct(stream, "ts", "value",
                                     window_duration="10 seconds",
                                     watermark_delay="5 seconds")

    def sink(batch_df, batch_id):
        out_rows.extend(r.asDict() for r in batch_df.collect())

    q = (windowed.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_windowed_hll_watermark_lifecycle(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    # batch 1: 10 distinct values in window [0,10), 3 in window [30,40)
    _write(spark, src, [(i, 1000 + i) for i in range(10)]
           + [(30 + i, 2000 + i) for i in range(3)])
    _run(spark, src, ckpt, out)

    w0 = [r for r in out if r["window_start"] == int(T0.timestamp())]
    # the data batch emits the running update; the watermark (32-5=27s,
    # past this window's 10s end) then times the state out in the
    # availableNow finalization trigger -> exactly one final row
    assert w0 and w0[0]["final"] == 0 and w0[0]["n_rows"] == 10
    assert [r["final"] for r in w0].count(1) == 1
    assert abs(w0[-1]["estimate"] - 10) <= 1

    # batch 2 (same checkpoint, watermark persisted): a late event for
    # the closed window (ts=2s, far below the watermark) must be
    # dropped — no reopened state, no post-final update rows — while
    # fresh events keep flowing.
    _write(spark, src, [(2, 9999), (41, 3000)])
    _run(spark, src, ckpt, out)

    w0 = [r for r in out if r["window_start"] == int(T0.timestamp())]
    finals = [r for r in w0 if r["final"] == 1]
    assert len(finals) == 1, w0
    assert finals[-1]["n_rows"] == 10          # late 9999 never merged
    assert w0[-1]["final"] == 1                # nothing after the close

    w40 = [r for r in out
           if r["window_start"] == int(T0.timestamp()) + 40]
    assert w40 and w40[-1]["n_rows"] == 1

    # batch 3: watermark moves past [30,40) -> its final row appears,
    # carrying all 3 rows from batch 1
    _write(spark, src, [(60, 4000)])
    _run(spark, src, ckpt, out)
    w30 = [r for r in out
           if r["window_start"] == int(T0.timestamp()) + 30]
    assert [r for r in w30 if r["final"] == 1][-1]["n_rows"] == 3


def test_windowed_hll_non_utc_session_timezone(spark, tmp_path):
    """Review finding: window bounds must come from JVM-side epoch casts,
    not Python .timestamp() on tz-naive session-zone datetimes — with a
    non-UTC session the naive interpretation shifts every bound by the
    UTC offset (crashing the timeout or double-finalizing windows)."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        src = str(tmp_path / "src_tz")
        ckpt = str(tmp_path / "ckpt_tz")
        out: list = []
        _write(spark, src, [(i, 5000 + i) for i in range(10)]
               + [(30, 6000)])
        _run(spark, src, ckpt, out)
        _write(spark, src, [(60, 7000)])
        _run(spark, src, ckpt, out)

        starts = sorted({r["window_start"] for r in out})
        assert all(s % 10 == 0 for s in starts)
        w0 = [r for r in out if r["window_start"] == starts[0]]
        finals = [r for r in w0 if r["final"] == 1]
        assert len(finals) == 1 and finals[0]["n_rows"] == 10
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_windowed_hll_null_values_dropped_jvm_side(spark, tmp_path):
    """Review finding: a null in a micro-batch must be dropped JVM-side.
    If nulls reached pandas, Arrow would hand the fn a float64 column
    and round 64-bit hashes above 2^53 — two huge adjacent hashes would
    collide (undercount) and nulls would perturb dtype handling."""
    src = str(tmp_path / "srcnull")
    ckpt = str(tmp_path / "ckptnull")
    out: list = []
    nullable = StructType([
        StructField("ts", TimestampType(), False),
        StructField("value", LongType(), True),
    ])
    big = (1 << 62) + 4        # adjacent 63-bit values: float64 would
    rows = [(T0, big), (T0 + dt.timedelta(seconds=1), big + 1),
            (T0 + dt.timedelta(seconds=2), None)]
    spark.createDataFrame(rows, nullable).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(nullable).parquet(src)
    windowed = windowed_hll_distinct(stream, "ts", "value",
                                     window_duration="10 seconds",
                                     watermark_delay="5 seconds")

    def sink(batch_df, batch_id):
        out.extend(r.asDict() for r in batch_df.collect())

    q = (windowed.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)

    w0 = [r for r in out if r["window_start"] == int(T0.timestamp())]
    assert w0
    # exactly the 2 non-null values, and the adjacent 63-bit hashes did
    # NOT collide through a float64 round-trip
    assert w0[-1]["n_rows"] == 2
    assert abs(w0[-1]["estimate"] - 2) < 0.5
