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
The BIGINT quotient is exact up to ``T <= min_count * 2^63 / 1e6``
bigrams (~46T tokens at the default min_count; c1, c2 >= c_pair
bounds the lift by T*1e6/min_count) — beyond that the plan fails
loudly via ``raise_error`` telling the caller to raise ``min_count``,
rather than ANSI-aborting opaquely or NULL-dropping the top rows.

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

from fastfilter_spark.functions.text import token_ngrams, word_tokens

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

    # the same adjacent-gram extraction every other n-gram operator
    # uses (functions/text.py token_ngrams); tokens are strictly
    # [a-z]+, so splitting the space-joined gram back into (w1, w2)
    # after the aggregate is lossless — and the split runs on the
    # DISTINCT grams only, not the exploded stream
    pair_counts = (docs.select(F.explode(
                       token_ngrams(F.col(text_col), 2)).alias("g"))
                   .groupBy("g")
                   .agg(F.count("*").alias("c_pair"))
                   .withColumn("_ws", F.split("g", " "))
                   .select(F.element_at("_ws", 1).alias("w1"),
                           F.element_at("_ws", 2).alias("w2"),
                           "c_pair"))
    uni_counts = (docs.select(F.explode(word_tokens(F.col(text_col)))
                              .alias("w"))
                  .groupBy("w").agg(F.count("*").alias("c")))
    # T (corpus bigram total) from a NARROW scan — sum of per-doc gram
    # counts needs no explode and no gram shuffle.  Deriving it from
    # pair_counts.agg(sum) would execute the corpus-wide explode +
    # hash-aggregate subtree a second time (two uncached consumers).
    total = docs.agg(
        F.sum(F.size(token_ngrams(F.col(text_col), 2)))
        .cast("long").alias("_t"))

    candidates = pair_counts.where(F.col("c_pair") >= min_count)
    joined = (candidates
              .join(uni_counts.select(F.col("w").alias("w1"),
                                      F.col("c").alias("c1")), "w1")
              .join(uni_counts.select(F.col("w").alias("w2"),
                                      F.col("c").alias("c2")), "w2")
              .crossJoin(F.broadcast(total)))
    # DECIMAL(38,0): c_pair * T * 1e6 at web scale is ~1e12 * 1e15 *
    # 1e6 = 1e33 < 1e38; the div floors exactly in both engines.  The
    # QUOTIENT must fit BIGINT: a word occurs at least as often as any
    # bigram containing it (c1, c2 >= c_pair), so
    # lift <= T * LIFT_SCALE / min_count — the in-plan guard below
    # fails LOUDLY when the corpus outgrows that exact-integer regime
    # (T > min_count * 2^63/1e6 ≈ min_count * 9.2e12 bigrams; raising
    # min_count buys linear headroom) instead of ANSI-aborting on an
    # opaque overflow or, worse, NULLing out precisely the top-lift
    # rows under non-ANSI sessions.
    # the guard must bound BOTH failure modes: the BIGINT quotient
    # (<= T*SCALE/min_count) AND the DECIMAL(38,0) product
    # c_pair*T*SCALE <= T^2*SCALE (c_pair <= T) — for very large
    # min_count the product bound binds first
    import math
    t_max = min(min_count * ((2 ** 63 - 1) // LIFT_SCALE),
                math.isqrt((10 ** 38 - 1) // LIFT_SCALE))
    scored = joined.select(
        "w1", "w2", "c_pair", "c1", "c2",
        F.expr(f"CASE WHEN _t > {t_max}L THEN "
               f"CAST(raise_error('pmi_collocations: bigram total ' "
               f"|| _t || ' exceeds the exact-BIGINT lift regime for "
               f"min_count={min_count}; raise min_count') AS BIGINT) "
               f"ELSE CAST(CAST(c_pair AS DECIMAL(38,0)) * _t "
               f"* {LIFT_SCALE} DIV (CAST(c1 AS DECIMAL(38,0)) * c2) "
               "AS BIGINT) END").alias("lift_ppm"))
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
