"""Randomized cross-checks for the round-4 pipeline operators vs
independent pure-Python twins over seeded adversarial data (duplicate
timestamps, null groups, skewed domains, tied priorities).  One Spark
pass per operator (test_text_invariants precedent)."""
import datetime as dt
import hashlib
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.asof import asof_join
from fastfilter_spark.operators.collocations import pmi_collocations
from fastfilter_spark.operators.diff import corpus_diff
from fastfilter_spark.operators.frontier import crawl_frontier
from fastfilter_spark.operators.splits import leakage_safe_split


def _ts(m):
    return dt.datetime(2026, 3, 1) + dt.timedelta(minutes=int(m))


def test_asof_matches_python_twin_with_duplicate_times(spark):
    rng = random.Random(11)
    lrows = [(rng.randint(0, 5), _ts(rng.randint(0, 40)), i)
             for i in range(200)]
    # duplicate (k, rt) pairs on purpose: twin must apply the same
    # max-payload tie resolution
    rrows = [(rng.randint(0, 5), _ts(rng.randint(0, 40)),
              rng.randint(0, 9)) for _ in range(120)]
    left = spark.createDataFrame(lrows, "k long, t timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, rt timestamp, rv long")
    got = {r["lid"]: (r["rt_r"], r["rv_r"])
           for r in asof_join(left, right, "k", "t", "rt",
                              right_cols=["rv"]).collect()}
    by_key = defaultdict(list)
    for k, rt, rv in rrows:
        by_key[k].append((rt, rv))
    assert len(got) == len(lrows)
    for k, t, lid in lrows:
        cand = [(rt, rv) for rt, rv in by_key[k] if rt <= t]
        exp = max(cand) if cand else (None, None)
        assert got[lid] == exp, (lid, got[lid], exp)


def test_split_matches_md5_twin_and_null_groups(spark):
    groups = [f"g{i}" for i in range(150)] + [None] * 10
    df = spark.createDataFrame([(g,) for g in groups], "g string")
    got = {r["g"]: r["split"]
           for r in leakage_safe_split(df, "g").collect()}

    def twin(g):
        if g is None:
            return None
        h = int(hashlib.md5(f"split-v1|{g}".encode())
                .hexdigest()[:15], 16) % 1_000_000
        return "train" if h < 900_000 else \
            "val" if h < 950_000 else "test"
    for g in set(groups):
        assert got[g] == twin(g), g


def test_frontier_matches_sorted_twin_under_ties(spark):
    rng = random.Random(5)
    rows = [(f"https://d{rng.randint(0, 3)}.example.com/p{i}",
             rng.randint(0, 4)) for i in range(80)]   # tied priorities
    df = spark.createDataFrame(rows, "url string, prio long")
    got = {r["url"]: (r["domain"], r["wave"], r["worker"])
           for r in crawl_frontier(df, priority_col="prio",
                                   n_workers=8).collect()}
    by_dom = defaultdict(list)
    for url, prio in rows:
        by_dom["example.com"].append((url, prio))
    order = sorted(by_dom["example.com"], key=lambda r: (-r[1], r[0]))
    for wave, (url, _) in enumerate(order):
        assert got[url][1] == wave, url
    h = int(hashlib.md5(b"example.com").hexdigest()[:15], 16) % 8
    assert all(v[2] == h for v in got.values())


def test_collocations_match_counter_twin(spark):
    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["w1"], r["w2"], r["c_pair"], r["c1"], r["c2"],
            r["lift_ppm"]) for r in
           pmi_collocations(df, min_count=3, top_k=50).collect()]
    uni, pairs = Counter(), Counter()
    for _, text in docs:
        toks = text.split()
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    T = sum(pairs.values())
    exp = sorted(
        ((w1, w2, c, uni[w1], uni[w2],
          c * T * 1_000_000 // (uni[w1] * uni[w2]))
         for (w1, w2), c in pairs.items() if c >= 3),
        key=lambda r: (-r[5], r[0], r[1]))[:50]
    assert got == exp


def test_diff_matches_dict_twin(spark):
    rng = random.Random(9)
    old = {i: f"doc {i} v{rng.randint(0, 1)}" for i in range(100)
           if rng.random() > 0.2}
    new = {i: (f"doc {i} v{rng.randint(0, 1)}") for i in range(110)
           if rng.random() > 0.2}
    odf = spark.createDataFrame(list(old.items()),
                                "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()),
                                "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(odf, ndf, "doc_id").collect()}
    for i in set(old) | set(new):
        exp = ("added" if i not in old else
               "removed" if i not in new else
               "unchanged" if old[i] == new[i] else "changed")
        assert got[i] == exp, i
