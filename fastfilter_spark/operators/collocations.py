"""Corpus-level collocation mining: top word bigrams by PMI-ordered
lift, in exact integer arithmetic.

Training-corpus diagnostics need "which word pairs co-occur far more
than chance" — boilerplate phrases ("all rights reserved", "click
here"), entity names, and templated spam all surface as high-lift
bigrams, and the resulting list feeds stopphrase filters the same way
`remove_boilerplate_lines` consumes repeated lines.  (The reference
library has no text layer; this rides on the same SQL-portable
tokenizer as the other oracle-checked text operators,
functions/text.py `word_tokens`.)

Exactness policy (same as kmv/moments/pagerank): PMI itself is
``ln(c_ab * T / (c_a * c_b))`` — a float.  ``ln`` is monotone, so
ranking by the integer *lift* ``(c_ab * T * 1_000_000) div
(c_a * c_b)`` (exp(PMI) in parts-per-million, computed in
DECIMAL(38,0) / HUGEINT) yields the byte-identical order in Spark and
any SQL oracle with 128-bit integers, with no cross-engine libm ulp
risk.  The float PMI is trivially ``ln(lift_ppm / 1e6)`` downstream.

Plan shape at 10^12 documents, three wide steps (stated honestly):

1. Bigram counts: explode adjacent-pair grams, ONE hash aggregate on
   the gram — map-side combine collapses every repeated phrase before
   the exchange, so the shuffle carries the distinct-bigram set
   (zipf-shaped; AQE skew-split absorbs the head keys).
2. Unigram counts: same shape keyed by token (vocabulary-sized
   exchange).  The two scans share the tokenizer subtree; Spark runs
   them as two jobs over one cached/columnar source scan.
3. Joining unigram counts onto the surviving bigrams happens AFTER
   ``min_count`` pruning, so the join's left side is the (small)
   candidate set, not the full bigram table; the unigram side stays a
   shuffle join (the vocabulary of a web corpus is 100M+ rows — NOT
   broadcastable; hot head-words are exactly AQE's skew-join case).
   The scalar bigram total T is a one-row cross join.

The final ``top_k`` is an ``orderBy().limit()`` —
TakeOrderedAndProject, no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import word_tokens

__all__ = ["pmi_collocations"]

#: lift scale: lift_ppm == 1_000_000 means "exactly as often as chance"
LIFT_SCALE = 1_000_000


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, top_k: int = 100) -> DataFrame:
    """Top ``top_k`` word bigrams by lift (monotone in PMI), exact.

    Returns ``(rank, w1, w2, c_pair, c1, c2, lift_ppm)`` — all counts
    corpus-wide longs, ``lift_ppm = (c_pair * T * 1e6) div (c1*c2)``
    with ``T`` the corpus bigram total, rank 1 = highest lift.  Ties
    break on (w1, w2) ascending so the order is deterministic.

    ``min_count`` prunes rare pairs BEFORE the unigram joins: raw PMI
    famously promotes hapax pairs (two words that each occur once,
    together) — a count floor is the standard fix and also caps the
    join's candidate side.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    toks = word_tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2")))
    ).otherwise(F.array().cast(
        "array<struct<w1:string,w2:string>>"))

    pair_counts = (docs.select(F.explode(grams).alias("g"))
                   .select("g.w1", "g.w2")
                   .groupBy("w1", "w2")
                   .agg(F.count("*").alias("c_pair")))
    uni_counts = (docs.select(F.explode(word_tokens(F.col(text_col)))
                              .alias("w"))
                  .groupBy("w").agg(F.count("*").alias("c")))
    total = pair_counts.agg(
        F.sum("c_pair").cast("long").alias("_t"))

    candidates = pair_counts.where(F.col("c_pair") >= min_count)
    joined = (candidates
              .join(uni_counts.select(F.col("w").alias("w1"),
                                      F.col("c").alias("c1")), "w1")
              .join(uni_counts.select(F.col("w").alias("w2"),
                                      F.col("c").alias("c2")), "w2")
              .crossJoin(F.broadcast(total)))
    # DECIMAL(38,0): c_pair * T * 1e6 at web scale is ~1e12 * 1e15 *
    # 1e6 = 1e33 < 1e38; the div floors exactly in both engines
    scored = joined.select(
        "w1", "w2", "c_pair", "c1", "c2",
        F.expr(f"CAST(CAST(c_pair AS DECIMAL(38,0)) * _t "
               f"* {LIFT_SCALE} DIV (CAST(c1 AS DECIMAL(38,0)) * c2) "
               "AS BIGINT)").alias("lift_ppm"))
    order = [F.col("lift_ppm").desc(), F.col("w1").asc(),
             F.col("w2").asc()]
    top = scored.orderBy(*order).limit(top_k)
    # rank over the already-limited top_k rows: one tiny single-
    # partition window, never a corpus-wide sort (same pattern as
    # sampling.priority_sample's tau)
    return (top.withColumn("rank", F.row_number().over(
                Window.orderBy(*order)))
            .select("rank", "w1", "w2", "c_pair", "c1", "c2",
                    "lift_ppm"))
