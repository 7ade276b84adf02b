"""Z-order (Morton) clustering for multi-column data skipping.

At 100 TB the scan you avoid is worth more than the scan you
optimize: lakehouse tables prune files by per-file min/max column
ranges, and range-partitioning by ONE column leaves every OTHER
column's per-file range as wide as the table.  Interleaving the bits
of several columns' bucket codes (the Morton / Z-order curve — the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) makes rows
close on the curve close in EVERY dimension, so per-file min/max
tightens on all clustered columns at once and point/range predicates
on any of them prune files.

Mechanics, exact-integer end to end (oracle-replayable):

1. per column: an affine bucket code ``(x - min) * (2^bits - 1) div
   (max - min)`` — the min/max come from ONE cheap scalar aggregate
   (broadcast join), the product runs in DECIMAL(38,0) so any BIGINT
   column buckets exactly, and the code is deterministic (no
   sampling, no approx quantiles).  Value-range bucketing is the
   standard Morton prelude; heavily skewed columns bucket unevenly —
   pre-transform (e.g. a hash or log scale) when ranks matter more
   than values.
2. bit-interleave the codes into one BIGINT key (column i owns bit
   positions ``i, i+n, i+2n, ...``) — pure codegen, a generated
   shift/AND/OR expression, no Python anywhere.
3. ``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` —
   ONE range exchange (plus its internal sampling pass) lays the
   table out along the curve; writers then emit one file per
   partition and the table's min/max index does the rest.

``bits`` per column is bounded by 63 // n_cols (the interleaved key
must fit a signed BIGINT); 8-16 bits per column is the practical
range — finer codes stop paying once files hold fewer distinct codes
than rows.

The reference library (FastFilter/xor_singleheader) has no storage-layout layer;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_cluster"]


def _interleave_expr(codes: list[str], bits: int) -> str:
    """SQL for the Morton interleave of pre-bucketed integer codes
    (column i at bit positions i, i+n, i+2n, ...).  Generated as a
    flat shift/AND sum so it stays inside whole-stage codegen."""
    n = len(codes)
    terms = [f"(shiftleft(shiftright({c}, {b}) & 1, {b * n + i}))"
             for i, c in enumerate(codes) for b in range(bits)]
    return " + ".join(terms)


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = 8) -> DataFrame:
    """``df`` plus an exact-integer ``zkey`` column interleaving
    ``cols`` (numeric).  Adds one scalar min/max aggregate of the
    input (broadcast back); rows where any clustered column is null
    get a null zkey (sorted first by repartitionByRange — the
    conventional 'unclusterable' bucket)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError(
            f"bits * len(cols) must be in [1, 63], got {bits * len(cols)}")
    if "zkey" in df.columns:
        raise ValueError("output column 'zkey' already exists")
    # helper aliases are POSITIONAL (_ff_min_0, not _ff_min_<name>) so
    # arbitrary column names (dashes, dots) can't misparse the
    # generated SQL; any caller column in the _ff_ namespace would
    # still collide with them, so it is reserved (asof.py convention)
    for c in df.columns:
        if c.startswith("_ff_"):
            raise ValueError(
                f"column {c!r} uses the reserved _ff_ prefix; rename it")
    hi = (1 << bits) - 1
    # backtick-quoted references resolve names literally (F.col('c.d')
    # and df['c.d'] both parse the dot as struct access); a backtick
    # inside the name itself escapes by doubling
    def _q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    stats = df.agg(*[f(F.expr(_q(c))).alias(f"_ff_{n}_{i}")
                     for i, c in enumerate(cols)
                     for n, f in (("min", F.min), ("max", F.max))])
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType,
    )
    out = df.crossJoin(F.broadcast(stats))
    code_names = []
    for i, c in enumerate(cols):
        mn, mx = f"_ff_min_{i}", f"_ff_max_{i}"
        code = f"_ff_code_{i}"
        code_names.append(code)
        dt = next(f.dataType for f in df.schema.fields if f.name == c)
        integral = isinstance(dt, (ByteType, ShortType,
                                   IntegerType, LongType))
        if integral:
            # DECIMAL(38,0) keeps (x-min)*(2^bits-1) exact for any
            # BIGINT range; DIV floors exactly
            bucket = (f"(CAST({_q(c)} AS DECIMAL(38,0)) - {mn}) * {hi} "
                      f"DIV (CAST({mx} AS DECIMAL(38,0)) - {mn})")
        else:
            # float/decimal columns: DIV rejects DOUBLE operands, so
            # bucket in double arithmetic — deterministic within an
            # engine, approximate by nature (floats carry rounding
            # anyway); LEAST guards the x==max edge against fp
            # round-up past the top bucket
            bucket = (f"LEAST({hi}L, CAST(floor("
                      f"(CAST({_q(c)} AS DOUBLE) - {mn}) * {hi} "
                      f"/ (CAST({mx} AS DOUBLE) - {mn})) AS BIGINT))")
        # null value -> null code (checked FIRST: the degenerate
        # max=min arm must not swallow nulls into bucket 0);
        # degenerate single-value columns bucket to 0
        out = out.withColumn(code, F.expr(
            f"CASE WHEN {_q(c)} IS NULL THEN NULL "
            f"WHEN {mx} = {mn} THEN 0L ELSE {bucket} END"))
    out = out.withColumn(
        "zkey", F.expr(_interleave_expr(code_names, bits)).cast("long"))
    return out.drop(*code_names,
                    *[f"_ff_{n}_{i}" for i in range(len(cols))
                      for n in ("min", "max")])


def zorder_cluster(df: DataFrame, cols: list[str], bits: int = 8,
                   num_partitions: int | None = None) -> DataFrame:
    """Lay ``df`` out along the Z-curve of ``cols``: compute ``zkey``,
    range-partition on it, sort within partitions — the write-side
    shape whose per-file min/max tightens on every clustered column.
    ``num_partitions`` defaults to the session shuffle parallelism."""
    keyed = zorder_key(df, cols, bits)
    if num_partitions is None:
        # the conf may be non-numeric on some platforms (e.g. "auto"
        # under Databricks AQE) — fall back to the cluster default
        try:
            parts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            parts = df.sparkSession.sparkContext.defaultParallelism
    else:
        parts = num_partitions
    return (keyed.repartitionByRange(parts, F.col("zkey"))
            .sortWithinPartitions("zkey"))
