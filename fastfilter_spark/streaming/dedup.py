"""Ingest-time streaming dedup: drop repeated documents as they
arrive, with bounded state.

The batch dedup layer (operators/dedup.py) assumes the corpus is at
rest; a crawl INGEST stream sees the same url/page again within
hours (re-crawls, mirrors, redirect aliases), and dropping those at
ingest is far cheaper than carrying them to the nightly batch job.
This wraps Structured Streaming's watermarked dedup with the
library's conventions:

- **Dedup key is the 16-byte content fingerprint** (`doc_fingerprint`
  — md5, the same identity the batch layer and snapshot diff use),
  optionally compound with an explicit key column (url) — never the
  raw text: state stores and the shuffle carry fingerprints only.
- **State is bounded by the watermark.**
  ``dropDuplicatesWithinWatermark`` keeps a fingerprint in state only
  until the event-time watermark passes ``delay`` beyond it, so the
  state store holds ~(ingest rate x delay) fingerprints, not corpus
  history.  Duplicates FARTHER apart than the watermark pass through
  — ingest dedup is a rate filter, not a guarantee; the batch
  exact_dedup downstream remains the authority (documented contract,
  matching production lakehouse practice).
- One shuffle per micro-batch, keyed by the fingerprint; state-store
  lookups are local to the post-shuffle partition.

The reference library (FastFilter/xor_singleheader) has no streaming layer;
this extends the training-data pipeline layer mandated alongside
SURVEY.md §2 (packing.py precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import doc_fingerprint

__all__ = ["dedup_stream"]


def dedup_stream(stream: DataFrame, ts_col: str,
                 delay: str = "1 hour",
                 text_col: str = "text",
                 key_cols: list[str] | None = None) -> DataFrame:
    """Watermarked exact dedup of a streaming DataFrame.

    ``ts_col`` must be the event-time column; ``delay`` is both the
    watermark delay and the dedup window (two identical documents
    within ``delay`` of each other deduplicate; farther apart they
    both pass — bounded-state contract above).  ``key_cols`` prepends
    explicit identity columns (e.g. url) to the content fingerprint;
    with ``text_col=None`` only ``key_cols`` dedup.
    """
    keys = list(key_cols or [])
    if text_col is not None:
        # the helper column only exists on this path — a key-cols-only
        # stream may legitimately carry its own '_ff_fp'
        if "_ff_fp" in stream.columns:
            raise ValueError(
                "reserved column '_ff_fp' present in input")
        stream = stream.withColumn(
            "_ff_fp", doc_fingerprint(F.col(text_col)))
        keys.append("_ff_fp")
    if not keys:
        raise ValueError("need text_col and/or key_cols to dedup on")
    out = (stream.withWatermark(ts_col, delay)
           .dropDuplicatesWithinWatermark(keys))
    return out.drop("_ff_fp") if text_col is not None else out
