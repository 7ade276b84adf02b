"""crawl_frontier: politeness waves, worker pinning, quotas."""
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.frontier import crawl_frontier


@pytest.fixture()
def urls(spark):
    rows = [
        ("https://a.example.org/1", 10),
        ("https://b.a.example.org/2", 30),   # same regdom example.org
        ("https://a.example.org/3", 20),
        ("https://x.other.net/1", 5),
    ]
    return spark.createDataFrame(rows, "url string, prio long")


def test_waves_follow_priority_within_domain(urls):
    out = crawl_frontier(urls, priority_col="prio", n_workers=8)
    got = {r["url"]: (r["domain"], r["wave"])
           for r in out.collect()}
    assert got["https://b.a.example.org/2"] == ("example.org", 0)
    assert got["https://a.example.org/3"] == ("example.org", 1)
    assert got["https://a.example.org/1"] == ("example.org", 2)
    assert got["https://x.other.net/1"] == ("other.net", 0)


def test_domain_pins_to_one_worker_deterministically(urls):
    a = crawl_frontier(urls, priority_col="prio", n_workers=8).collect()
    b = crawl_frontier(urls, priority_col="prio", n_workers=8).collect()
    assert {(r["url"], r["worker"]) for r in a} == \
        {(r["url"], r["worker"]) for r in b}
    by_dom = {}
    for r in a:
        by_dom.setdefault(r["domain"], set()).add(r["worker"])
        assert 0 <= r["worker"] < 8
    assert all(len(ws) == 1 for ws in by_dom.values())


def test_quota_caps_waves(urls):
    out = crawl_frontier(urls, priority_col="prio", max_per_domain=2)
    per_dom = {r["domain"]: r["n"] for r in
               out.groupBy("domain").agg(F.count("*").alias("n"))
               .collect()}
    assert per_dom["example.org"] == 2
    assert out.agg(F.max("wave")).first()[0] <= 1


def test_no_priority_orders_by_url_and_validation(urls, spark):
    out = crawl_frontier(urls.select("url"))
    got = {r["url"]: r["wave"] for r in out.collect()}
    assert got["https://a.example.org/1"] == 0  # lexicographic
    with pytest.raises(ValueError, match="n_workers"):
        crawl_frontier(urls, n_workers=0)
    with pytest.raises(ValueError, match="max_per_domain"):
        crawl_frontier(urls, max_per_domain=0)
    with pytest.raises(ValueError, match="already exists"):
        crawl_frontier(urls.withColumn("wave", F.lit(1)))


def test_domain_col_override(spark):
    df = spark.createDataFrame(
        [("u1", "siteA"), ("u2", "siteA"), ("u3", "siteB")],
        "url string, grp string")
    out = crawl_frontier(df, domain_col="grp")
    got = {r["url"]: (r["domain"], r["wave"]) for r in out.collect()}
    assert got["u1"] == ("siteA", 0) and got["u2"] == ("siteA", 1)
    assert got["u3"] == ("siteB", 0)


def test_existing_domain_column_not_clobbered(spark):
    df = spark.createDataFrame(
        [("u1", "siteA", "PRECIOUS")],
        "url string, grp string, domain string")
    with pytest.raises(ValueError, match="already exists"):
        crawl_frontier(df, domain_col="grp")
    # designating the existing column itself as the grouping key is fine
    out = crawl_frontier(df.select("url", "domain"), domain_col="domain")
    assert out.first()["domain"] == "PRECIOUS"


def test_null_domain_gets_null_schedule(spark):
    df = spark.createDataFrame(
        [("https://a.example.org/1", 1), (None, 2)],
        "url string, prio long")
    got = {r["prio"]: (r["domain"], r["wave"], r["worker"])
           for r in crawl_frontier(df, priority_col="prio",
                                   max_per_domain=5).collect()}
    assert got[2] == (None, None, None)   # surfaced, not scheduled
    assert got[1][1] == 0 and got[1][2] is not None
