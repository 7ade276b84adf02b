"""Leakage-safe deterministic train/val/test splitting.

Splitting a web corpus row-by-row (``rand() < 0.9``) leaks: near-
duplicate pages from one site land on both sides of the split, and a
model evaluated on the held-out side has effectively seen the test
set.  The standard fix is to split by a GROUP key that contains the
duplication (registered domain for web pages, repo for code, cluster
id from `connected_components` for a deduped corpus) — every row of a
group lands on the same side by construction.

Mechanics: hash the group key with the engine-portable
`portable_hash60` (salted, so independent splits decorrelate), take
the hash modulo 1e6, and cut the bucket space at the cumulative
fraction thresholds.  Properties:

- **Zero shuffle, zero state.**  The split is a pure projection —
  each row's label is a function of its own group value, so the
  operator runs at scan throughput on 10^12 rows, is trivially
  resumable, and never materializes an assignment table.  (The
  alternative — sample distinct groups, join back — costs a distinct
  aggregate plus a join of every row against the assignment; this
  costs nothing and is stable under corpus growth: adding new rows of
  an existing group NEVER moves the group, where re-sampling would.)
- **Deterministic and engine-portable**: md5-based, so the DuckDB
  oracle reproduces the exact assignment and any engine can recompute
  membership later (provenance).
- **Fraction accuracy is group-weighted**: fractions cut the GROUP
  hash space uniformly; the row-count realized per side converges to
  the fractions only as far as group sizes are balanced (a corpus
  dominated by one giant domain cannot be split 90/5/5 at row
  granularity by ANY leakage-safe scheme — that mass moves together
  by design).

The reference library (FastFilter/xor_singleheader) has no dataset-splitting layer;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastfilter_spark.operators.kmv import portable_hash60

__all__ = ["leakage_safe_split", "split_column"]

#: bucket space the cumulative fraction thresholds cut (ppm)
BUCKETS = 1_000_000


def split_column(group_col: Column,
                 fractions: dict[str, float],
                 salt: str = "split-v1") -> Column:
    """The split label as a pure Column expression (composable into
    any projection).  ``fractions`` maps label -> fraction; they must
    sum to 1 (within 1e-9) and each must round to >= 1ppm.
    Assignment: ``bucket = portable_hash60(salt || '|' || group) %
    1e6`` cut at the ROUNDED CUMULATIVE thresholds in the dict's
    insertion order (per-label rounding would accumulate error).

    A NULL group yields a NULL label — silently hashing nulls would
    drop every null-group row (IP-literal / unparseable urls are a
    few percent of a web corpus) into ONE side wholesale.  Callers
    decide: filter them, or pre-fill a real group key
    (``coalesce(registered_domain(url), url)``)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(v <= 0 for v in fractions.values()):
        raise ValueError("every fraction must be > 0")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {sum(fractions.values())})")
    # cut points from the rounded CUMULATIVE sums (not summed per-label
    # roundings, whose error accumulates and can reject valid dicts or
    # squeeze the last bucket): monotone by construction, and the last
    # cut is exactly BUCKETS because the fractions sum to 1
    labels = list(fractions)
    cuts, acc = [], 0.0
    for lab in labels[:-1]:
        acc += fractions[lab]
        cuts.append(round(acc * BUCKETS))
    lo = 0
    for cut in cuts + [BUCKETS]:
        if cut - lo < 1:
            raise ValueError(
                "a fraction rounds to an empty ppm bucket; every "
                f"label needs >= 1ppm (cut points {cuts})")
        lo = cut
    # F.concat propagates NULL (concat_ws would silently skip it and
    # hash the bare salt, collapsing all null groups into one bucket)
    bucket = portable_hash60(
        F.concat(F.lit(salt), F.lit("|"), group_col)) % BUCKETS
    # NULL group first: a NULL bucket fails every `<` comparison and
    # would otherwise silently take the `otherwise` label
    expr = F.when(group_col.isNull(), F.lit(None).cast("string"))
    for lab, cut in zip(labels[:-1], cuts):
        expr = expr.when(bucket < F.lit(cut), lab)
    return expr.otherwise(labels[-1])


def leakage_safe_split(df: DataFrame, group_col: str,
                       fractions: dict[str, float] | None = None,
                       salt: str = "split-v1",
                       out_col: str = "split") -> DataFrame:
    """``df`` plus a ``split`` label column, constant per group.

    ``group_col`` should be the unit that contains the near-duplicate
    mass: `registered_domain(url)` for raw web pages, the
    `connected_components` cluster representative for a deduped
    corpus.  Default fractions 90/5/5 train/val/test.
    """
    if fractions is None:
        fractions = {"train": 0.90, "val": 0.05, "test": 0.05}
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    return df.withColumn(
        out_col, split_column(F.col(group_col), fractions, salt))
