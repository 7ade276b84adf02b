"""applyInPandasWithState: per-key running HLL across micro-batches,
surviving a query restart from checkpoint."""

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from fastfilter_spark.streaming.stateful import running_distinct_per_key

_SCHEMA = StructType([StructField("domain", StringType(), False),
                      StructField("url_key", LongType(), False)])


def _feed(spark, src, lo, hi):
    spark.range(lo, hi).select(
        F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias("domain"),
        F.xxhash64(F.col("id")).alias("url_key"),
    ).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (running_distinct_per_key(stream, "domain", "url_key", p=12)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_running_distinct_per_key(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _feed(spark, src, 0, 4000)
    _run(spark, src, ckpt, out)
    # second batch in a FRESH query (restart-from-checkpoint path)
    _feed(spark, src, 4000, 6000)
    _run(spark, src, ckpt, out)

    res = spark.read.parquet(out)
    # last emitted row per key carries the running total
    latest = {r["key"]: (r["estimate"], r["n_updates"])
              for r in res.orderBy("n_updates").collect()}
    assert set(latest) == {"d0", "d1", "d2", "d3"}
    for k, (est, n_up) in latest.items():
        assert n_up == 1500              # 6000 rows over 4 keys
        assert abs(est - 1500) / 1500 < 0.08  # distinct urls per domain


def test_running_distinct_non_string_key(spark, tmp_path):
    """Review finding: the output key field must mirror the INPUT key
    type — a hardcoded StringType made any bigint key column die at the
    pandas->Arrow boundary."""
    src = str(tmp_path / "srclong")
    ckpt = str(tmp_path / "ckptlong")
    out = str(tmp_path / "outlong")
    schema = StructType([StructField("domain_id", LongType(), False),
                         StructField("url_key", LongType(), False)])
    spark.range(0, 2000).select(
        (F.col("id") % 4).alias("domain_id"),
        F.xxhash64(F.col("id")).alias("url_key"),
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (running_distinct_per_key(stream, "domain_id", "url_key", p=12)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    res = spark.read.parquet(out)
    assert dict(res.dtypes)["key"] == "bigint"
    latest = {r["key"]: r["n_updates"] for r in res.collect()}
    assert set(latest) == {0, 1, 2, 3}
    assert all(n == 500 for n in latest.values())
