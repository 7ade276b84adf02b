"""Gap-based sessionization of event streams.

The standard clickstream/telemetry operator the reference's ecosystem
feeds into: per entity, consecutive events closer than ``gap_seconds``
belong to one session; a longer silence starts a new one.

Shape at scale: ONE shuffle (window over the entity key).  Per-entity
state is a single lag + running sum, so a task is bounded by the
largest single entity's event count — entity keys are the natural
partition and are high-cardinality, so no salting is needed (unlike
value-keyed aggs).  Timestamp columns compare as exact integer
microseconds (``unix_micros``), so sub-second gaps resolve with no
float rounding and a SQL oracle (``epoch_us``) reproduces the
arithmetic bit-for-bit; numeric ts columns compare as double seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(df: DataFrame, entity_col: str, ts_col: str,
               gap_seconds: float = 1800.0,
               tiebreak_col: str | None = None,
               out_col: str = "session_idx") -> DataFrame:
    """Append ``out_col``: the 1-based session index within each
    entity (session key = (entity, session_idx)).  Events exactly
    ``gap_seconds`` apart stay in the SAME session (strict > starts a
    new one).  ``tiebreak_col`` breaks equal timestamps
    deterministically (pass the event id; without it, equal-ts
    ordering is shuffle-dependent and session boundaries with them).
    """
    from pyspark.sql import Window

    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists; pass a "
                         "different out_col")
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    if "_ff_new_session" in df.columns:
        raise ValueError("column '_ff_new_session' is used internally; "
                         "rename it first")
    from pyspark.sql.types import TimestampNTZType, TimestampType

    w = Window.partitionBy(entity_col).orderBy(*order)
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampType):
        # exact integer microseconds: no float rounding at the gap
        # boundary, and a SQL oracle (epoch_us) reproduces it exactly
        ts = F.unix_micros(F.col(ts_col))
        gap = F.lit(int(round(gap_seconds * 1_000_000)))
    elif isinstance(dt, TimestampNTZType):
        # NTZ is wall-clock with NO timezone: casting it to
        # TimestampType would reinterpret the wall value in the session
        # timezone, and across a DST transition two events 30 minutes
        # apart would measure a 90- or -30-minute gap.  timestampdiff
        # over two NTZ operands is pure wall-clock arithmetic, so the
        # micros are timezone-independent (any fixed anchor works —
        # only differences are consumed).
        ts = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)")
        gap = F.lit(int(round(gap_seconds * 1_000_000)))
    else:
        ts = F.col(ts_col).cast("double")
        gap = F.lit(float(gap_seconds))
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull() | ((ts - prev) > gap),
        F.lit(1)).otherwise(F.lit(0)).cast("long")
    # two projections: a lag window inside a sum window does not
    # reliably resolve as one nested expression
    flagged = df.withColumn("_ff_new_session", new_session)
    idx = F.sum("_ff_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return flagged.withColumn(out_col, idx).drop("_ff_new_session")
