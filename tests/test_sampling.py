"""Priority sampling: pure-python replay, partition invariance,
estimator accuracy, and edge cases."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.kmv import HMAX60
from fastfilter_spark.operators.sampling import (
    priority_sample,
    priority_subset_sum,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_priority_sample(rows, k):
    """rows: [(id, weight, *rest)] -> {id: est_weight} replay."""
    pri = [(w * HMAX60 // (_h60(str(i)) + 1), _h60(str(i)) + 1, i, w)
           for i, w, *_ in rows if w and w > 0]
    pri.sort(key=lambda t: (-t[0], t[1], t[2]))
    tau = pri[k][0] if len(pri) > k else 0
    return {i: max(w, tau) for _, _, i, w in pri[:k]}


def _rows(n, seed=3):
    rng = random.Random(seed)
    return [(i, int(rng.paretovariate(1.3) * 10) + 1,
             f"s{i % 5}") for i in range(n)]


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "id long, w long, src string")
    return df.repartition(parts) if parts else df


def test_matches_python_replay(spark):
    rows = _rows(30, seed=9)
    got = {r.id: r.est_weight
           for r in priority_sample(_df(spark, rows), "id", "w",
                                    k=8).collect()}
    assert got == _py_priority_sample(rows, 8)


def test_partition_invariant(spark):
    rows = _rows(500)
    a = sorted(map(tuple, priority_sample(
        _df(spark, rows, 1), "id", "w", k=32).collect()))
    b = sorted(map(tuple, priority_sample(
        _df(spark, rows, 13), "id", "w", k=32).collect()))
    assert a == b and len(a) == 32


def test_small_input_is_exact(spark):
    rows = _rows(10)
    out = priority_sample(_df(spark, rows), "id", "w", k=64).collect()
    assert len(out) == 10
    assert all(r.est_weight == r.w for r in out)


def test_total_estimate_within_bound(spark):
    rows = _rows(2000, seed=17)
    total = sum(w for _, w, _ in rows)
    sample = priority_sample(_df(spark, rows), "id", "w", k=256)
    est = sample.agg(F.sum("est_weight")).collect()[0][0]
    # DLT total-sum stderr <= total / sqrt(k-1); allow 5 sigma
    assert abs(est - total) <= 5 * total / (255 ** 0.5), (est, total)


def test_subset_sums_consistent_with_sample(spark):
    rows = _rows(800, seed=5)
    sample = priority_sample(_df(spark, rows), "id", "w", k=128)
    per_src = {r.src: (r.est_sum, r.n_sampled)
               for r in priority_subset_sum(sample, ["src"]).collect()}
    replay = _py_priority_sample(rows, 128)
    by_src: dict = {}
    for i, w, src in rows:
        if i in replay:
            s = by_src.setdefault(src, [0, 0])
            s[0] += replay[i]
            s[1] += 1
    assert per_src == {s: tuple(v) for s, v in by_src.items()}
    assert sum(v[1] for v in per_src.values()) == 128


def test_null_and_nonpositive_weights_excluded(spark):
    rows = [(1, 5, "a"), (2, 0, "a"), (3, -4, "a"), (4, None, "a")]
    out = priority_sample(_df(spark, rows), "id", "w", k=3).collect()
    assert [r.id for r in out] == [1]
    assert out[0].est_weight == 5


def test_guards(spark):
    df = _df(spark, _rows(5))
    with pytest.raises(ValueError, match="positive"):
        priority_sample(df, "id", "w", k=0)
    with pytest.raises(ValueError, match="already present"):
        priority_sample(df.withColumn("est_weight", F.lit(1)),
                        "id", "w", k=2)


def test_plan_uses_take_ordered(spark):
    df = _df(spark, _rows(200), 8)
    plan = priority_sample(df, "id", "w", k=16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
