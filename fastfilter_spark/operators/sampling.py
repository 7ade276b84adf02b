"""Priority sampling: a fixed-size weighted sample with unbiased
subset-sum estimation (Duffield-Lund-Thorup, JACM 2007).

The training-mix question at 100 TB is "how many tokens does slice X
hold?" for slices decided AFTER the scan — per source, per language,
per domain.  Exact answers need a groupBy per slice; a priority sample
of k rows answers EVERY slice from the same k rows: for subset S,
``sum over sampled rows in S of max(w_i, tau)`` is an unbiased
estimate of ``sum over S of w_i`` (tau = the (k+1)-th largest
priority), with near-optimal variance among all k-sample schemes
(DLT 2007, Szegedy 2006).

Determinism/portability (same policy as operators/kmv.py): randomness
comes from the engine-portable 60-bit md5 hash of the row id, and the
priority ``q_i = w_i * 2^60 DIV (h_i + 1)`` is an exact integer floor
division (DECIMAL(38,0) product, BIGINT quotient) — both engines sort
the same priorities, pick the same rows, and compute the same
estimates, so a DuckDB oracle hash-matches the Spark result.

Scale shape: the priority projection is pure JVM codegen; the top-(k+1)
selection is a ``TakeOrderedAndProject`` (per-partition heap of k+1,
then one merge — no global sort, no wide exchange; this is also why
the sample is MERGEABLE: the top-(k+1) of a union is the top-(k+1) of
per-part top-(k+1) sets).  k is a driver-side quantity — keep it in
the 10^2..10^5 range.

The reference (FastFilter/xor_singleheader) has no sampling operators;
this extends the pipeline layer mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastfilter_spark.operators.kmv import HMAX60, portable_hash60

__all__ = ["priority_sample", "priority_subset_sum"]

_H = "_ff_h"
_PRI = "_ff_priority"
_TAU = "_ff_tau"
_RN = "_ff_rn"


def priority_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int) -> DataFrame:
    """The k-row priority sample: input columns plus ``est_weight``
    (BIGINT) such that ``sum(est_weight)`` over any predicate's sampled
    rows is an unbiased estimate of ``sum(weight_col)`` over all rows
    matching that predicate.

    Rows with null/non-positive weight are excluded (they contribute
    nothing to any subset sum; negative weights are outside the DLT
    model).  When the input has <= k qualifying rows the sample is the
    whole input and every estimate is exact (``est_weight = weight``).

    Ties in priority are broken by hash then id — deterministic, and
    two DISTINCT ids collide in 60 hash bits with probability ~2^-60
    per pair, so the tie-break's bias is unmeasurable.  The BIGINT
    priority quotient can only exceed int64 when a row's hash falls
    below ~weight/8 (odds ~1e-16 per row at weight 10^3); ANSI mode
    raises there rather than corrupting the sample.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    for c in (_H, _PRI, _TAU, _RN, "est_weight"):
        if c in df.columns:
            raise ValueError(f"column {c!r} already present in input")
    qualifying = df.where(F.col(weight_col).isNotNull()
                          & (F.col(weight_col) > 0))
    # +1 keeps the divisor in [1, 2^60]: u = h/2^60 in (0, 1], exactly
    # the DLT uniform draw, and div-by-zero cannot happen
    with_pri = (qualifying
                .withColumn(_H, portable_hash60(
                    F.col(id_col).cast("string")) + F.lit(1))
                .withColumn(_PRI, F.expr(
                    f"CAST(`{weight_col}` AS DECIMAL(38,0)) "
                    f"* {HMAX60} div {_H}")))
    order = [F.col(_PRI).desc(), F.col(_H).asc(), F.col(id_col).asc()]
    topk1 = with_pri.orderBy(*order).limit(k + 1)
    # tau = priority of row k+1 (0 when the input had <= k rows),
    # derived as a whole-frame window over the ALREADY-LIMITED k+1
    # rows: an aggregate-then-crossJoin would evaluate the
    # TakeOrderedAndProject subtree twice (it is not an Exchange, so
    # ReuseExchange cannot dedupe it) — twice the corpus scan for the
    # operator's dominant cost.  The window runs on <= k+1 rows in one
    # partition, which is exactly the scale a top-k head stage owns.
    ranked = topk1.withColumn(
        _RN, F.row_number().over(Window.orderBy(*order)))
    w_all = (Window.orderBy(*order)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    ranked = ranked.withColumn(_TAU, F.coalesce(
        F.max(F.when(F.col(_RN) == k + 1, F.col(_PRI))).over(w_all),
        F.lit(0).cast("long")))
    return (ranked.where(F.col(_RN) <= k)
            .select(*df.columns,
                    F.greatest(F.col(weight_col).cast("long"),
                               F.col(_TAU)).alias("est_weight")))


def priority_subset_sum(sample: DataFrame, group_cols: list[str],
                        ) -> DataFrame:
    """Per-group unbiased subset-sum estimates from a priority sample:
    ``group_cols..., est_sum (BIGINT), n_sampled (BIGINT)``.  Groups
    with no sampled row are estimated 0 and are absent — outer-join
    against the group dimension if zeros must be explicit."""
    return (sample.groupBy(*group_cols)
            .agg(F.sum("est_weight").cast("long").alias("est_sum"),
                 F.count("*").cast("long").alias("n_sampled")))
