"""Randomized cross-checks: every new text operator vs an independent
pure-Python twin over a seeded adversarial corpus (repeats, digits,
punctuation, PII-ish spans, empty/short docs), plus idempotence
properties.  One Spark pass per operator."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import (
    PII_PATTERNS, dedup_lines, redact_pii, pii_counts,
    repetition_signal_columns, token_budget_mix, token_ngrams,
    top_bigram_stats,
)

_VOCAB = ["the", "cat", "sat", "on", "mat", "spam", "2021", "2022",
          "a@b.cc", "10.0.0.1", "555-010-0199", "x", "", "Zebra!",
          "the", "spam"]  # repeats raise dup rates


def _corpus(n=60, seed=7):
    import random
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        k = rng.randint(0, 14)
        docs.append((i, " ".join(rng.choice(_VOCAB) for _ in range(k))))
    docs += [(n, ""), (n + 1, "one"), (n + 2, "dup dup dup")]
    return docs


def _tok(text):
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_corpus(), "doc_id int, text string") \
        .repartition(7).cache()


def test_dedup_lines_twin_and_idempotence(spark, corpus_df):
    out = corpus_df.select(
        "doc_id", "text",
        dedup_lines(F.col("text"), sep=" ").alias("d1"))
    out = out.select("doc_id", "text", "d1",
                     dedup_lines(F.col("d1"), sep=" ").alias("d2"))
    for r in out.collect():
        seen, firsts = set(), []
        for w in r.text.split(" "):
            if w not in seen:
                seen.add(w)
                firsts.append(w)
        assert r.d1 == " ".join(firsts), r.doc_id
        assert r.d2 == r.d1  # idempotent


def test_repetition_signals_twin(spark, corpus_df):
    cols = repetition_signal_columns(F.col("text"), sep=" ")
    out = corpus_df.select(
        "doc_id", "text", *[c.alias(n) for n, c in cols.items()])
    for r in out.collect():
        lines = r.text.split(" ")
        firsts = list(dict.fromkeys(lines))
        assert r.n_lines == len(lines)
        assert r.n_distinct_lines == len(firsts)
        assert r.line_chars == sum(len(x) for x in lines)
        assert r.distinct_line_chars == sum(len(x) for x in firsts)
        assert r.n_distinct_lines <= r.n_lines
        assert r.distinct_line_chars <= r.line_chars


def test_token_ngrams_and_top_bigram_twin(spark, corpus_df):
    out = {r.doc_id: r.g for r in corpus_df.select(
        "doc_id", token_ngrams(F.col("text"), 2).alias("g")).collect()}
    tops = {r.doc_id: r for r in
            top_bigram_stats(corpus_df, "text", "doc_id").collect()}
    for doc_id, text in _corpus():
        tk = _tok(text)
        grams = [" ".join(tk[i:i + 2]) for i in range(len(tk) - 1)]
        assert out[doc_id] == grams, doc_id
        t = tops[doc_id]
        assert t.n_bigrams == len(grams)
        if grams:
            cnt = Counter(grams)
            best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
            assert (t.top_bigram_count, t.top_bigram_len) == \
                (best[1], len(best[0])), doc_id
        else:
            assert (t.top_bigram_count, t.top_bigram_len) == (0, 0)


def test_pii_twin_and_idempotence(spark, corpus_df):
    counts = pii_counts(F.col("text"))
    out = corpus_df.select(
        "doc_id", "text", redact_pii(F.col("text")).alias("r1"),
        *[c.alias(n) for n, c in counts.items()])
    out = out.select("*", redact_pii(F.col("r1")).alias("r2"))
    for r in out.collect():
        masked = r.text
        for name, pat, token in PII_PATTERNS:
            assert getattr(r, f"n_{name}") == len(re.findall(pat, masked))
            masked = re.sub(pat, token, masked)
        assert r.r1 == masked, r.doc_id
        assert r.r2 == r.r1  # idempotent: tokens contain no digits


def test_token_budget_mix_prefix_property(spark, corpus_df):
    """The selected set must be exactly the greedy prefix of the
    source's hash order — simulate in Python from the same order."""
    df = corpus_df.withColumn("source",
                              (F.col("doc_id") % 3).cast("string")) \
        .withColumn("toks", F.length("text").cast("long") + 1)
    order = F.md5(F.concat_ws("|", F.col("text"),
                              F.col("doc_id").cast("string")))
    budgets = {"0": 50, "1": 120, "2": 1}
    picked = {r.doc_id for r in
              token_budget_mix(df, "source", "toks", budgets,
                               order_col=order).collect()}
    import hashlib
    rows = [(doc_id, text, str(doc_id % 3), len(text) + 1,
             hashlib.md5(f"{text}|{doc_id}".encode()).hexdigest())
            for doc_id, text in _corpus()]
    expect = set()
    for src, budget in budgets.items():
        cum = 0
        for doc_id, _t, s, toks, _h in sorted(
                (r for r in rows if r[2] == src), key=lambda r: r[4]):
            if cum < budget:
                expect.add(doc_id)
            cum += toks
    assert picked == expect
