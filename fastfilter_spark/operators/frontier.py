"""Crawl-frontier scheduling: politeness waves and worker sharding.

Turning a scored url list into a fetch schedule is the step between
ranking (pagerank / priority sampling) and the crawler fleet: fetches
against one registered domain must be SEQUENCED (politeness — one
request per domain per wave), every domain must pin to one worker so
its rate limit is enforced locally (domain-sharded frontier, the
standard crawler design), and per-domain quotas cap how deep a single
site can flood the crawl.

``crawl_frontier`` emits, per url: its ``domain``, the politeness
``wave`` (0-based rank within the domain by descending priority — the
earliest round this url may be fetched if the crawler issues one
request per domain per round), and the ``worker`` shard
(engine-portable hash of the domain, so the assignment is
reproducible across runs and engines).

Scale shape at 10^10 frontier urls: ONE exchange, keyed by domain
(the rank window).  The worker column is a pure projection
(`portable_hash60 % n_workers`).  Domain skew is intrinsic and
HARMLESS here: a giant domain serializes its own window partition,
but politeness forces that domain's fetches into sequence anyway —
the schedule is the bottleneck, not the scheduler; ``max_per_domain``
bounds the tail a single site contributes.  Worker-level balance is
the birthday bound over domains (hash-uniform), not urls; if one
domain's URL MASS dwarfs a worker, the quota is the lever.

The reference library (FastFilter/xor_singleheader) has no scheduling layer;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastfilter_spark.functions.urls import registered_domain
from fastfilter_spark.operators.kmv import portable_hash60

__all__ = ["crawl_frontier"]


def crawl_frontier(urls: DataFrame, url_col: str = "url",
                   priority_col: str | None = None,
                   n_workers: int = 64,
                   max_per_domain: int | None = None,
                   domain_col: str | None = None) -> DataFrame:
    """Input columns plus ``(domain, wave, worker)``.

    Ordering within a domain: descending ``priority_col`` (ties and
    the no-priority case fall back to ``url_col`` ascending, so the
    schedule is deterministic).  ``domain_col`` overrides the default
    ``registered_domain(url)`` grouping — pass the true registrable
    domain when a public-suffix-list join is available.
    ``max_per_domain`` drops urls whose wave is past the quota.
    """
    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    if max_per_domain is not None and max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1 (or None)")
    for c in ("domain", "wave", "worker"):
        # a pre-existing 'domain' column is fine ONLY when it is the
        # caller's designated grouping column (domain_col='domain') —
        # any other pre-existing output column would be clobbered
        if c in urls.columns and not (c == "domain"
                                      and domain_col == "domain"):
            raise ValueError(f"output column {c!r} already exists")

    dom = (F.col(domain_col) if domain_col
           else registered_domain(F.col(url_col)))
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col).asc()]
    with_dom = urls.withColumn("domain", dom)
    w = Window.partitionBy("domain").orderBy(*order)
    # a NULL domain (null url / null domain_col) cannot be scheduled —
    # it has no rate-limit identity — so its rows get NULL wave/worker
    # (splits.py convention: surface, don't silently lump all null
    # domains into one politeness sequence on one phantom worker);
    # callers filter or pre-fill
    out = (with_dom
           .withColumn("wave",
                       F.when(F.col("domain").isNotNull(),
                              (F.row_number().over(w) - 1).cast("long")))
           .withColumn("worker",
                       F.pmod(portable_hash60(F.col("domain")),
                              F.lit(n_workers)).cast("long")))
    if max_per_domain is not None:
        # null-wave (null-domain) rows pass through the quota — they
        # are unscheduled, not over-quota
        out = out.where(F.col("wave").isNull()
                        | (F.col("wave") < max_per_domain))
    return out
