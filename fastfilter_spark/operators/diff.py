"""Corpus snapshot diff: what changed between two crawl versions.

Incremental pipelines hinge on this: crawl N+1 re-fetches most of
crawl N, and re-deduping / re-scoring / re-tokenizing 100 TB because
3% changed is the classic waste.  ``corpus_diff`` classifies every
document id across two snapshots — ``added`` (only in new),
``removed`` (only in old), ``changed`` (both, different content
fingerprint), ``unchanged`` — so downstream stages process
``added + changed`` only and carry everything else forward.

Plan shape at 10^12 rows: each side reduces to (id, 16-byte md5
fingerprint) AT THE SCAN (column-pruned projection — the full text
never shuffles), then ONE full-outer shuffle join on id.  On bucketed
stores (`write_bucketed_keys` precedent) with both snapshots bucketed
by id the join is Exchange-free; ids are unique per side, so the join
is skew-free by construction.  The output is a projection of the
joined frame — `status` is never materialized driver-side.

Content identity is the same `doc_fingerprint` (md5) the dedup layer
uses, so "changed" means byte-different text, engine-portably.

The reference library (FastFilter/xor_singleheader) has no snapshot/CDC layer;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import doc_fingerprint

__all__ = ["corpus_diff", "diff_counts"]


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str = "text",
                fingerprint: Column | None = None) -> DataFrame:
    """``(id_col, status)`` for the union of ids across snapshots;
    ``status`` in added / removed / changed / unchanged.

    ``fingerprint`` overrides the content-identity expression (e.g. a
    struct hash over several columns); it is evaluated against each
    side's columns.  Ids must be NON-NULL and unique within each
    snapshot — the classifier's contract (enforce upstream with
    exact_dedup; a duplicated id would cross-join its rows here, and
    a null id can never join so it would double-report as one
    'removed' plus one 'added').  Null-id rows are excluded from both
    sides: a row without identity cannot be diffed.
    """
    fp = (fingerprint if fingerprint is not None
          else doc_fingerprint(F.col(text_col)))
    old = old.where(F.col(id_col).isNotNull())
    new = new.where(F.col(id_col).isNotNull())
    # presence is tagged with a literal, NOT inferred from fingerprint
    # nullness: a null-text document has a null md5, and treating that
    # as "row absent" would misclassify it (present-both-sides-null ->
    # 'added'); eqNullSafe makes two null fingerprints compare equal
    o = old.select(F.col(id_col), fp.alias("_ff_fp_old"),
                   F.lit(1).alias("_ff_in_old"))
    n = new.select(F.col(id_col), fp.alias("_ff_fp_new"),
                   F.lit(1).alias("_ff_in_new"))
    joined = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("_ff_in_old").isNull(), "added")
              .when(F.col("_ff_in_new").isNull(), "removed")
              .when(F.col("_ff_fp_old").eqNullSafe(F.col("_ff_fp_new")),
                    "unchanged")
              .otherwise("changed"))
    return joined.select(F.col(id_col), status.alias("status"))


def diff_counts(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str = "text",
                fingerprint: Column | None = None) -> DataFrame:
    """``(status, n)`` — the one-line summary a pipeline run logs
    before deciding how much work crawl N+1 actually brings."""
    return (corpus_diff(old, new, id_col, text_col, fingerprint)
            .groupBy("status").agg(F.count("*").alias("n"))
            .orderBy("status"))
