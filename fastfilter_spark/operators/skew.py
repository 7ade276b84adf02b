"""Skew-aware aggregation: two-phase salted aggregates.

Common-Crawl url distributions are zipf-heavy (a handful of domains own
double-digit percentages of all pages — sources/webpages.py synthesizes
exactly that), so a naive ``groupBy(domain)`` sends a hot key's entire
volume to one reducer.  The standard fix is salting: append a random
salt to the key, aggregate partially per (key, salt), then aggregate the
S partial rows per key.  Phase 1 spreads each hot key over S reducers;
phase 2 touches only ``distinct_keys x S`` rows.

The filter build itself needs no salting — shard routing hashes the
key, so only *duplicate* keys could skew a shard, and those collapse in
the in-kernel dedup (operators/dist.py).  Salting matters for the
aggregation stages around the pipeline (per-domain stats, heavy-hitter
counts), so it lives here as a first-class operator.

AQE's skew-join splitting handles the join side of the same problem;
``salted_agg`` covers aggregations, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


# phase-1 aggregate builder and phase-2 refold per supported op.  ONLY
# algebraic aggregates decompose over salts: avg() would become a sum of
# per-salt averages, DISTINCT aggregates would count a value once per
# salt — both silently wrong, hence the explicit whitelist (Column
# introspection cannot detect DISTINCT: Spark 4 renders count(DISTINCT x)
# as plain 'count(x)' and Connect Columns expose no expression at all).
_SALTED_OPS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, key_cols: list[str],
               aggs: dict[str, tuple[str, str] | Column],
               n_salts: int = 16) -> DataFrame:
    """Two-phase groupBy with salt spreading.

    ``aggs`` maps output column name -> ("op", column) with op in
    {sum, count, min, max}; column is a name or a Column expression
    (use "*" with count for row counts).
    Results are identical to the unsalted
    ``df.groupBy(*key_cols).agg(...)``; non-algebraic aggregates (avg,
    DISTINCT forms, ...) are rejected by construction.
    """
    specs: dict[str, tuple[str, str]] = {}
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2
                and spec[0] in _SALTED_OPS):
            raise ValueError(
                f"salted_agg aggregate {name!r} must be ('op', 'column') "
                f"with op in {sorted(_SALTED_OPS)}; got {spec!r}. "
                "Non-algebraic aggregates (avg, DISTINCT, ...) cannot "
                "decompose over salts.")
        specs[name] = spec

    # Deterministic per-row salt: hash of ALL input columns + the map
    # partition id.  A nondeterministic salt (monotonically_increasing_id,
    # rand) is the classic shuffle hazard — a map task re-executed after
    # a shuffle-fetch failure would assign different salts than the lost
    # attempt, duplicating/dropping phase-1 partials.  Content+partition
    # is stable across retries (a re-executed task keeps its partition id
    # and rows) AND still spreads hot keys whose rows are byte-identical
    # (the canonical skewed count(*) case): identical rows collapse to
    # one salt only WITHIN a map partition — where the phase-1 map-side
    # combine collapses them into a single partial row anyway — while
    # across partitions the hot key fans out over the salt range.
    salted = df.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.lit(0x5A17), F.spark_partition_id(),
                                    *[F.col(c) for c in df.columns]),
                         F.lit(n_salts))).cast("int"))

    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[_SALTED_OPS[op][0](col).alias(f"_p1_{name}")
          for name, (op, col) in specs.items()])

    return phase1.groupBy(*key_cols).agg(
        *[_SALTED_OPS[op][1](F.col(f"_p1_{name}")).alias(name)
          for name, (op, _) in specs.items()])


def domain_of(url_col: Column) -> Column:
    """Extract the host from an url (JVM regexp; trailing path
    optional, so path-less urls still yield their host)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1)


def domain_stats(webpages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-domain page counts + text volume with salt spreading — the
    canonical hot-prefix aggregation over the webpages table."""
    keyed = webpages.select(
        domain_of(F.col("url")).alias("domain"),
        F.length("text").alias("_chars"))
    return salted_agg(
        keyed, ["domain"],
        {"n_pages": ("count", "*"),
         "total_chars": ("sum", "_chars"),
         "max_chars": ("max", "_chars")},
        n_salts=n_salts)
