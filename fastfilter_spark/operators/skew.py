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


def salted_agg(df: DataFrame, key_cols: list[str],
               aggs: dict[str, Column], n_salts: int = 16) -> DataFrame:
    """Two-phase groupBy with salt spreading.

    ``aggs`` maps output column name -> phase-1 aggregate Column.  Only
    algebraic aggregates decompose over the two phases — sum / count /
    min / max (count re-aggregates as sum) — and anything else raises:
    silently refolding e.g. avg() as a sum of per-salt averages would
    return wrong answers.  Results are identical to the unsalted
    ``df.groupBy(*key_cols).agg(...)``.
    """
    salted = df.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(n_salts))).cast("int"))

    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[c.alias(f"_p1_{name}") for name, c in aggs.items()])

    def refold(name: str, col: Column) -> Column:
        if not hasattr(col, "_jc"):
            raise NotImplementedError(
                "salted_agg aggregate introspection needs classic PySpark "
                "Columns (no _jc on this object — Spark Connect?); pass "
                "only sum/count/min/max and use plain groupBy on Connect")
        fn = col._jc.toString().lower()
        p1 = F.col(f"_p1_{name}")
        if fn.startswith(("count(", "count_if(", "sum(")):
            return F.sum(p1).alias(name)
        if fn.startswith("min("):
            return F.min(p1).alias(name)
        if fn.startswith("max("):
            return F.max(p1).alias(name)
        raise ValueError(
            f"salted_agg only decomposes sum/count/min/max; got {fn!r} "
            f"for {name!r} (avg and friends are not algebraic over salts)")

    return phase1.groupBy(*key_cols).agg(
        *[refold(name, c) for name, c in aggs.items()])


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
        {"n_pages": F.count("*"),
         "total_chars": F.sum("_chars"),
         "max_chars": F.max("_chars")},
        n_salts=n_salts)
