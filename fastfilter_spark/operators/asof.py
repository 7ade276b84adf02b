"""Distributed as-of join: for each left row, the latest right row at
or before it in time, per key.

The temporal primitive a web-corpus pipeline keeps reinventing: join
every page fetch to the robots.txt snapshot in force when it was
crawled, every event to the most recent config/model checkpoint,
every document to the licence text current at its `warc_ts`.  Spark
has no built-in as-of join; the naive encoding — an inequality join
``l.t >= r.t`` plus a per-pair argmax — plans as a broadcast nested
loop (or a range join at best) whose candidate set is O(|L| x
matches) and explodes exactly when the right side has history.

This implementation is the union+window form, ONE shuffle total:

1. tag and union the two sides (left rows carry null right-payload,
   right rows carry their payload);
2. one window per key ordered by ``(time, tag)`` — right rows sort
   BEFORE left rows at equal time, so at-or-before is inclusive —
   where ``last_value(payload, ignoreNulls) OVER (... ROWS UNBOUNDED
   PRECEDING)`` carries the newest right payload forward;
3. keep left rows; rows with no prior right row keep nulls (left-join
   semantics), and an optional ``tolerance`` nulls matches older than
   the window.

Scale shape at 10^12 rows: the single exchange is keyed by ``on`` —
the union shuffles each row once (16-byte key + payload), the window
sort runs per key-partition, and there is NO candidate blowup: cost
is O((|L|+|R|) log(partition)) regardless of history depth.  A
pathologically hot key serializes its own window partition (the
ordering is semantic, so salting cannot split it without a second
pass); shard such keys upstream by a coarser time bucket if one key
dominates.  Tag + carried columns are pruned before the exchange, so
the shuffle carries only what the join returns.

DuckDB's native ``ASOF JOIN`` (same greatest-lower-bound semantics,
inclusive) serves as the oracle for the driver query.

The reference library (FastFilter/xor_singleheader) has no temporal join;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_TAG = "_ff_asof_tag"


def _q(name: str):
    """Literal column reference: F.col('meta.v') parses the dot as
    struct access (layout.py precedent); backticks resolve verbatim,
    with inner backticks escaped by doubling."""
    from pyspark.sql import functions as F
    return F.expr("`" + name.replace("`", "``") + "`")


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              suffix: str = "_r",
              tolerance: Column | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row plus the ``right_cols`` of
    the newest ``right`` row with ``right[right_time] <=
    left[left_time]`` on the same ``on`` key (inclusive; ties take
    the right row).  Unmatched left rows keep null right columns.

    ``right_cols`` defaults to every right column except ``on`` and
    ``right_time``; each is emitted as ``<name><suffix>`` (the
    matched timestamp itself is always included as
    ``<right_time><suffix>`` so callers can compute staleness).
    ``tolerance``: optional INTERVAL Column — matches where
    ``left_time - right_time > tolerance`` are nulled out (the match
    existed but is too stale).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in (on, right_time)]
    carried = [right_time] + [c for c in right_cols if c != right_time]
    out_names = {c: f"{c}{suffix}" for c in carried}
    clash = set(out_names.values()) & set(left.columns)
    if clash:
        raise ValueError(
            f"suffixed right columns {sorted(clash)} collide with left "
            f"columns; pass a different suffix")
    for rc in (_TAG, "_ff_t", "_ff_payload", "_ff_m"):
        if rc in left.columns or rc in right.columns:
            raise ValueError(
                f"reserved column {rc!r} present in input; rename it")

    # the carried payload travels as ONE struct so a single last_value
    # scan serves every carried column (N windows would re-sort N
    # times); left rows contribute a null struct, which ignoreNulls
    # skips
    payload = F.struct(*[_q(c).alias(c) for c in carried]).alias("_ff_payload")
    # a right row with NO timestamp can never satisfy rt <= t (SQL
    # comparison semantics; DuckDB's native ASOF agrees) — but a NULL
    # would sort FIRST in the window and be carried into every later
    # row, so it must be dropped, not sorted.  A null-time LEFT row
    # sorts first and therefore matches nothing: null columns out.
    r = right.where(_q(right_time).isNotNull()).select(
        _q(on).alias(on), _q(right_time).alias("_ff_t"),
        F.lit(0).alias(_TAG), payload)
    l_side = left.select(
        "*", _q(left_time).alias("_ff_t"),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema["_ff_payload"].dataType)
        .alias("_ff_payload"))
    # align schemas in ONE projection (a per-column withColumn loop
    # builds O(n) nested projections — quadratic analyzer cost on wide
    # left schemas): right rows carry nulls for the left columns
    r = r.select(
        "*", *[F.lit(None).cast(left.schema[c].dataType).alias(c)
               for c in left.columns if c != on])
    unioned = r.select(l_side.columns).unionByName(l_side)

    # payload as the final sort key: two right rows sharing (key, time)
    # would otherwise resolve by partition-scheduling luck — struct
    # ordering is lexicographic over the carried fields, so the
    # greatest payload wins deterministically (identical payloads are
    # interchangeable).  MapType is not orderable in Spark: when any
    # carried field contains a map, the tie-break is omitted and
    # duplicate-(key, time) right rows resolve arbitrarily — exclude
    # map columns via right_cols (or pre-collapse duplicates) when
    # that determinism matters.
    def _orderable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    order = [F.col("_ff_t").asc(), F.col(_TAG).asc()]
    if _orderable(r.schema["_ff_payload"].dataType):
        order.append(F.col("_ff_payload").asc())
    w = (Window.partitionBy(_q(on))
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (unioned
               .withColumn("_ff_m",
                           F.last("_ff_payload", ignorenulls=True).over(w))
               .where(F.col(_TAG) == 1))
    # getField resolves names literally — F.col("_ff_m.meta.ts") would
    # parse the dots as nested struct access (layout.py precedent)
    if tolerance is not None:
        matched = matched.withColumn(
            "_ff_m",
            F.when(F.col("_ff_m").getField(right_time)
                   >= _q(left_time) - tolerance, F.col("_ff_m")))
    return matched.select(
        *left.columns,
        *[F.col("_ff_m").getField(c).alias(out_names[c])
          for c in carried])
