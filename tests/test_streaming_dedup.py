"""dedup_stream: watermarked ingest dedup with bounded state."""
import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from fastfilter_spark.streaming.dedup import dedup_stream

_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("ts", TimestampType(), False),
    StructField("text", StringType(), True),
])


def _ts(m):
    return dt.datetime(2026, 4, 1) + dt.timedelta(minutes=int(m))


def _feed(spark, rows, src):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)


def _drain(spark, src, ckpt, out_rows):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    deduped = dedup_stream(stream, "ts", delay="30 minutes")

    def sink(df, _):
        out_rows.extend((r["doc_id"], r["text"]) for r in df.collect())

    q = (deduped.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_duplicates_within_watermark_dropped(spark, tmp_path):
    src, ckpt, got = str(tmp_path / "s"), str(tmp_path / "c"), []
    _feed(spark, [(1, _ts(0), "same page"),
                  (2, _ts(5), "same page"),       # dup within 30 min
                  (3, _ts(6), "other page")], src)
    _drain(spark, src, ckpt, got)
    ids = sorted(i for i, _ in got)
    assert ids == [1, 3]


def test_output_schema_drops_helper_and_keeps_columns(spark, tmp_path):
    src = str(tmp_path / "s")
    _feed(spark, [(1, _ts(0), "x")], src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    out = dedup_stream(stream, "ts")
    assert out.columns == ["doc_id", "ts", "text"]
    assert out.isStreaming


def test_state_expiry_lets_far_apart_dups_pass(spark, tmp_path):
    # two identical docs 10 hours apart with a 30-min window: state
    # for the first expires, the second passes (the documented
    # rate-filter contract — batch dedup downstream is the authority)
    src, ckpt, got = str(tmp_path / "s"), str(tmp_path / "c"), []
    _feed(spark, [(1, _ts(0), "page")], src)
    _drain(spark, src, ckpt, got)
    # state cleanup runs at batch END against the batch's new
    # watermark, so an intermediate batch must advance it past
    # ts(0) + 30min before the far-apart duplicate arrives
    _feed(spark, [(10, _ts(300), "advance")], src)
    _drain(spark, src, ckpt, got)
    _feed(spark, [(2, _ts(600), "page")], src)
    _drain(spark, src, ckpt, got)
    assert sorted(i for i, _ in got) == [1, 2, 10]


def test_key_cols_compound_identity_and_validation(spark, tmp_path):
    src = str(tmp_path / "s")
    _feed(spark, [(1, _ts(0), "x")], src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="need text_col"):
        dedup_stream(stream, "ts", text_col=None)
    with pytest.raises(ValueError, match="reserved"):
        dedup_stream(stream.withColumn("_ff_fp", F.lit(1)), "ts")
    # same text, different doc_id key -> both kept
    src2, ckpt2, got2 = str(tmp_path / "s2"), str(tmp_path / "c2"), []
    _feed(spark, [(1, _ts(0), "pg"), (2, _ts(1), "pg")], src2)
    stream2 = spark.readStream.schema(_SCHEMA).parquet(src2)
    dd = dedup_stream(stream2, "ts", key_cols=["doc_id"])

    def sink(df, _):
        got2.extend(r["doc_id"] for r in df.collect())

    q = (dd.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt2)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert sorted(got2) == [1, 2]
