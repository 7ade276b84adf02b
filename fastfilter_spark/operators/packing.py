"""Sequence packing: lay documents end-to-end into one global token
stream and cut it into fixed-length training sequences.

The last step of an LLM data pipeline ("GPT-style packing"): every
document gets a start offset in a deterministic concatenation of the
corpus, and sequence ``i`` is tokens ``[i*seq_len, (i+1)*seq_len)`` of
that stream.  The operator emits, per document, its stream position
and the sequences it lands in — the manifest a tokenizer/writer fleet
consumes to materialize shards independently (each writer grabs a
``seq_id`` range and reads exactly the manifest rows that overlap it).

Scale shape — the whole point of this implementation: a global
ordered cumulative sum is, naively, ONE window partition (Spark plans
``Window.orderBy(...)`` without partitionBy as Exchange
SinglePartition — every row through one task).  This runs the
textbook two-phase prefix sum instead:

1. bucket every doc by the TOP bits of its order hash (a hash prefix
   is order-preserving, so bucket boundaries respect the global
   order);
2. per-bucket token sums — a map-side-combined aggregation of
   ``2^bucket_bits`` rows; their cumulative offsets form a tiny
   driver-size table (the only single-partition step, 256 rows);
3. a window cumsum INSIDE each bucket (parallel across buckets) plus
   the broadcast bucket offset gives every doc its exact global
   start.

Determinism/portability: the order is ``(portable_hash60(id), id)``
(operators/kmv.py hash), so the stream layout is reproducible across
engines and runs — the DuckDB oracle computes the identical layout
with one flat window, and the two-phase result is tested equal to it.
The hash order also serves as the training-order document shuffle.

The reference (FastFilter/xor_singleheader) has no packing operator;
this extends the pipeline layer mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastfilter_spark.operators.kmv import portable_hash60

__all__ = ["pack_sequences"]

_H = "_ff_h"
_B = "_ff_bucket"
_CUM = "_ff_cum"
_OFF = "_ff_off"


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   seq_len: int, bucket_bits: int = 8) -> DataFrame:
    """Packing manifest: ``id_col, n_tokens, start_token, seq_id,
    offset_in_seq, end_seq_id`` (all counts BIGINT).

    ``seq_id = start_token DIV seq_len`` is the first training
    sequence the document touches, ``offset_in_seq`` its position in
    it, ``end_seq_id`` the last sequence it spills into (documents
    longer than ``seq_len`` span several; writers slice by the
    manifest).  Documents with null or non-positive token counts are
    excluded — they occupy no stream positions.

    The stream is gapless and overlap-free by construction:
    ``sum(n_tokens) == max(start_token + n_tokens)`` (asserted in
    tests under any partitioning).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if not 0 <= bucket_bits <= 20:
        raise ValueError("bucket_bits must be in [0, 20]")
    for c in (_H, _B, _CUM, _OFF):
        if c in df.columns:
            raise ValueError(f"column {c!r} already present in input")
    rows = (df.where(F.col(token_col).isNotNull()
                     & (F.col(token_col) > 0))
            .select(id_col,
                    F.col(token_col).cast("long").alias(token_col))
            .withColumn(_H, portable_hash60(F.col(id_col)))
            # top bucket_bits of the 60-bit hash: order-preserving
            .withColumn(_B, F.shiftrightunsigned(
                F.col(_H), 60 - bucket_bits)))
    # per-bucket totals -> cumulative offsets (2^bucket_bits rows; the
    # window over them is the plan's only single-partition step)
    bucket_sums = rows.groupBy(_B).agg(
        F.sum(token_col).alias("_ff_bsum"))
    woff = (Window.orderBy(_B)
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = bucket_sums.select(
        _B, F.coalesce(F.sum("_ff_bsum").over(woff), F.lit(0))
        .alias(_OFF))
    # within-bucket exclusive cumsum, parallel across buckets
    wcum = (Window.partitionBy(_B)
            .orderBy(F.col(_H).asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.col(_OFF) + F.col(_CUM) - F.col(token_col))
    return (rows
            .withColumn(_CUM, F.sum(token_col).over(wcum))
            .join(F.broadcast(offsets), _B)
            .select(id_col,
                    F.col(token_col).alias("n_tokens"),
                    start.cast("long").alias("start_token"))
            .select(id_col, "n_tokens", "start_token",
                    # integer div, not float /: float64 loses exactness
                    # past 2^53 stream positions
                    F.expr(f"start_token div {seq_len}").alias("seq_id"),
                    F.pmod(F.col("start_token"), seq_len).cast("long")
                    .alias("offset_in_seq"),
                    F.expr(f"(start_token + n_tokens - 1) "
                           f"div {seq_len}").alias("end_seq_id")))
