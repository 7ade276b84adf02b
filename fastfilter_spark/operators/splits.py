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
    sum to 1 (at most 1ppm BELOW after ppm rounding — never above, so
    the last label's remainder bucket can't be squeezed empty).
    Assignment: ``bucket = portable_hash60(salt || '|' || group) %
    1e6`` cut at cumulative thresholds in the dict's insertion order.

    A NULL group yields a NULL label — silently hashing nulls would
    drop every null-group row (IP-literal / unparseable urls are a
    few percent of a web corpus) into ONE side wholesale.  Callers
    decide: filter them, or pre-fill a real group key
    (``coalesce(registered_domain(url), url)``)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    ppm = {k: round(v * BUCKETS) for k, v in fractions.items()}
    if not 0 <= BUCKETS - sum(ppm.values()) <= 1:
        raise ValueError(
            f"fractions must sum to 1, not above and at most 1ppm "
            f"below after rounding (got {sum(ppm.values())/BUCKETS})")
    if any(v <= 0 for v in ppm.values()):
        raise ValueError("every fraction must be > 0")
    # F.concat propagates NULL (concat_ws would silently skip it and
    # hash the bare salt, collapsing all null groups into one bucket)
    bucket = portable_hash60(
        F.concat(F.lit(salt), F.lit("|"), group_col)) % BUCKETS
    labels = list(ppm)
    # NULL group first: a NULL bucket fails every `<` comparison and
    # would otherwise silently take the `otherwise` label
    expr, hi = F.when(group_col.isNull(),
                      F.lit(None).cast("string")), 0
    # cut points accumulate in insertion order; the last label takes
    # the remainder so rounding never leaves an unlabeled bucket
    for lab in labels[:-1]:
        hi += ppm[lab]
        expr = expr.when(bucket < F.lit(hi), lab)
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
