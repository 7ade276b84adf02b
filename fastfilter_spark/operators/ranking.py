"""BM25 ranked retrieval over a document corpus.

The missing piece between the dedup/decontamination layer and a usable
training-data workbench: "which documents match this query, best
first" — used in practice to pull near-matches of benchmark prompts
for contamination review, to build retrieval baselines, and to audit
what a filter pass kept.  (The reference library has no text layer;
this feeds on the same tokenizer as the oracle-checked text operators,
functions/text.py `word_tokens`.)

Scale shape at 10^12 documents:

- ONE corpus-wide shuffle: the (doc, term) explode feeding the
  term-frequency aggregate, map-side combined (duplicate terms within
  a doc collapse before the exchange).  This is the standard
  inverted-index build cost; for repeated queries, materialize
  ``tf``/``dl`` once and reuse.
- Everything query-dependent is broadcast-sized: the query-term filter
  prunes the exploded stream map-side (``isin`` over a literal list),
  per-term document frequencies are ≤|query| rows (explicit
  ``F.broadcast``), and the corpus stats (N, Σdl) are a single row
  cross-joined in.
- The final ordered top-k is ``TakeOrderedAndProject`` — no global
  sort materialization.

Reproducibility (the property the DuckDB oracle checks): floating-
point addition is not associative, so the per-document score sums its
per-term contributions in EXPLICIT term order (``aggregate`` over an
``array_sort``-ed struct list here; ``sum(... ORDER BY term)`` in the
oracle) — a plain SUM would be partition-order-dependent and could
flip ranks between runs at scale.  Division/multiplication order is
written identically in both engines; the only op that may differ by an
ulp cross-engine is ``ln`` (JVM vs libm), which rank+id integer output
absorbs (ann_topk precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import word_tokens

__all__ = ["bm25_scores", "bm25_topk"]


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id_col, score double) for every document matching >=1 query
    term.  Okapi BM25 with the BM25+-style positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; ``N`` and ``avgdl`` are
    computed over documents with at least one token.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    k1, b = float(k1), float(b)

    toks = docs.select(F.col(id_col),
                       F.explode(word_tokens(F.col(text_col)))
                       .alias("term"))
    # document lengths + corpus stats (single tiny row, cross-joined)
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("sum_dl"))

    # term frequencies for the query terms only: the isin prunes the
    # exploded stream map-side, BEFORE the tf exchange
    tf = (toks.where(F.col("term").isin(terms))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats)))
    # canonical op order, mirrored token-for-token by the SQL oracle
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    # double BEFORE the product: dl * n_docs as int64 overflows once
    # n_docs reaches 10^12 with book-length documents (ANSI abort);
    # the oracle mirrors the cast order token-for-token
    rel_dl = (F.col("dl").cast("double") * F.col("n_docs").cast("double")) \
        / F.col("sum_dl").cast("double")
    tscore = idf * ((F.col("tf") * F.lit(k1 + 1.0))
                    / (F.col("tf") + F.lit(k1)
                       * (F.lit(1.0 - b) + F.lit(b) * rel_dl)))
    # EXPLICIT term-ordered float sum (see module docstring)
    return (scored.withColumn("_ts", tscore)
            .groupBy(id_col)
            .agg(F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "_ts"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_ts"]).alias("score")))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents by BM25: (rank int, id_col) — integer
    output, float ordering (rank ties broken by id ascending)."""
    scores = bm25_scores(docs, query_terms, id_col=id_col,
                         text_col=text_col, k1=k1, b=b)
    # TakeOrderedAndProject FIRST (per-partition top-k heaps, no
    # single-partition exchange of the full scored set — common query
    # terms score a large fraction of the corpus), THEN rank the k
    # survivors with a window that only ever sees k rows
    topk = scores.orderBy(F.desc("score"), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("rank", id_col))
