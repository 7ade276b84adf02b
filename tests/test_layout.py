"""zorder_key / zorder_cluster: exact Morton codes and the
data-skipping property they exist for."""
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.layout import zorder_cluster, zorder_key


def _morton(a, b, bits):
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zkey_matches_python_replay(spark):
    rows = [(i, (i * 37) % 101) for i in range(101)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df, ["x", "y"], bits=7).collect()}
    # min=0, max=100 for both columns; code = v*127 div 100
    for (x, y), z in got.items():
        assert z == _morton(x * 127 // 100, y * 127 // 100, 7)


def test_null_and_degenerate_columns(spark):
    df = spark.createDataFrame(
        [(1, 5), (None, 5), (3, 5)], "x long, c long")
    got = {r["x"]: r["zkey"]
           for r in zorder_key(df, ["x", "c"], bits=4).collect()}
    assert got[None] is None           # null x -> null zkey
    # degenerate c (single value) buckets to 0 -> zkey from x alone;
    # min=1 max=3 so x=1 -> code 0 -> zkey 0, x=3 -> code 15
    assert got[1] == 0 and got[3] is not None and got[3] > 0


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x long, zkey long")
    with pytest.raises(ValueError, match="already exists"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="non-empty"):
        zorder_key(df.select("x"), [])
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df.select("x"), ["x"], bits=64)


def test_cluster_tightens_per_partition_ranges_on_both_columns(spark):
    # a grid: row-major layout makes y's per-partition range the FULL
    # domain; the z-curve must shrink both columns' spans
    n = 64
    df = (spark.range(n * n)
          .select((F.col("id") % n).alias("x"),
                  (F.col("id") / n).cast("long").alias("y")))
    parts = 16
    clustered = zorder_cluster(df, ["x", "y"], bits=6,
                               num_partitions=parts)
    spans = (clustered.withColumn("p", F.spark_partition_id())
             .groupBy("p")
             .agg((F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy"))
             .collect())
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    # 4096 rows into 16 partitions of ~256 = a 16x16 curve tile; give
    # slack for range-partition boundary cuts
    assert avg_sx < n / 2 and avg_sy < n / 2, (avg_sx, avg_sy)
    # and the layout is lossless
    assert clustered.count() == n * n


def test_zkey_is_codegen_only(spark):
    df = spark.range(100).select(F.col("id").alias("x"),
                                 (F.col("id") * 3).alias("y"))
    plan = (zorder_key(df, ["x", "y"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan     # no Python in the hot path


def test_null_in_degenerate_column_still_nulls_zkey(spark):
    # the degenerate (max=min) arm must not swallow nulls into bucket 0
    df = spark.createDataFrame(
        [(1, 5), (2, None)], "x long, c long")
    got = {r["x"]: r["zkey"]
           for r in zorder_key(df, ["x", "c"], bits=4).collect()}
    assert got[2] is None and got[1] is not None


def test_reserved_prefix_and_odd_column_names(spark):
    df = spark.createDataFrame([(1, 2)], "x long, _ff_code_0 long")
    with pytest.raises(ValueError, match="reserved"):
        zorder_key(df, ["x"])
    odd = spark.createDataFrame([(1, 2), (9, 8)],
                                ["a-b", "c.d"])
    got = zorder_key(odd, ["a-b", "c.d"], bits=4).collect()
    assert {r["zkey"] for r in got} == {0, 255}


def test_double_columns_cluster(spark):
    rows = [(i / 100.0, i) for i in range(101)]
    df = spark.createDataFrame(rows, "x double, y long")
    got = zorder_key(df, ["x", "y"], bits=7).collect()
    # x in [0,1] must still spread across buckets (no decimal
    # truncation collapse) and the max row hits the top code on both
    zs = {r["x"]: r["zkey"] for r in got}
    assert zs[1.0] == _morton(127, 127, 7)
    assert zs[0.0] == 0
    assert len({r["zkey"] for r in got}) > 50


def test_written_parquet_file_stats_tighten_on_both_columns(spark, tmp_path):
    """The claim the operator exists for, verified on DISK: per-file
    parquet footer min/max — what a lakehouse prunes by — tightens on
    BOTH clustered columns, while a row-major write leaves the second
    column's span at the full domain."""
    import glob
    import pyarrow.parquet as pq

    n = 64
    df = (spark.range(n * n)
          .select((F.col("id") % n).alias("x"),
                  (F.col("id") / n).cast("long").alias("y")))

    def file_spans(path):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if name in lo and st is not None:
                        lo[name] = st.min if lo[name] is None \
                            else min(lo[name], st.min)
                        hi[name] = st.max if hi[name] is None \
                            else max(hi[name], st.max)
            if lo["x"] is not None:
                spans.append((hi["x"] - lo["x"], hi["y"] - lo["y"]))
        return spans

    from fastfilter_spark.operators.layout import zorder_cluster
    zpath = str(tmp_path / "z")
    (zorder_cluster(df, ["x", "y"], bits=6, num_partitions=16)
     .write.parquet(zpath))
    rpath = str(tmp_path / "r")
    df.repartitionByRange(16, "x").write.parquet(rpath)

    zs = file_spans(zpath)
    rs = file_spans(rpath)
    z_avg_x = sum(s[0] for s in zs) / len(zs)
    z_avg_y = sum(s[1] for s in zs) / len(zs)
    r_avg_y = sum(s[1] for s in rs) / len(rs)
    # z-order: both columns' per-file span well under the domain;
    # x-only range partitioning leaves y at the FULL domain per file
    assert z_avg_x < n / 2 and z_avg_y < n / 2, (z_avg_x, z_avg_y)
    assert r_avg_y > 0.9 * (n - 1), r_avg_y
