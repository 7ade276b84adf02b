"""filter_members (arrow-native probe) agrees with the where(udf) path."""

from pyspark.sql import functions as F

from fastfilter_spark.operators.dist import build_sharded


def test_filter_members_matches_where(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = li.select("l_orderkey").distinct().limit(300)
    sf, _ = build_sharded(dim, "l_orderkey", kind="fuse8", shard_bits=1)

    via_where = li.where(sf.contains_udf(spark)(F.col("l_orderkey")))
    via_arrow = sf.filter_members(li, "l_orderkey", spark)
    assert via_arrow.count() == via_where.count()
    assert via_arrow.schema == li.schema
    # same exact row multiset
    assert via_arrow.exceptAll(via_where).count() == 0
    assert via_where.exceptAll(via_arrow).count() == 0

    # negate: complement partitions the table
    out = sf.filter_members(li, "l_orderkey", spark, negate=True)
    assert out.count() + via_arrow.count() == li.count()
