"""Gopher repetition-filter signals (duplicate lines, top bigram):
hand-computed expectations plus edge cases."""

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import (
    repetition_signal_columns, top_bigram_stats,
)


def _sig_rows(spark, rows, sep="\n"):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cols = repetition_signal_columns(F.col("text"), sep=sep)
    out = df.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_duplicate_line_signals_hand_computed(spark):
    got = _sig_rows(spark, [
        # 3 lines, "ab" repeated: 2 distinct; chars 2+3+2=7, distinct 2+3=5
        (1, "ab\nxyz\nab"),
        (2, "one"),             # single line, no sep
        (3, "a\na\na\na"),      # all-dup: 4 lines 1 distinct
    ])
    assert got[1] == {"doc_id": 1, "n_lines": 3, "n_distinct_lines": 2,
                      "line_chars": 7, "distinct_line_chars": 5}
    assert got[2] == {"doc_id": 2, "n_lines": 1, "n_distinct_lines": 1,
                      "line_chars": 3, "distinct_line_chars": 3}
    assert got[3] == {"doc_id": 3, "n_lines": 4, "n_distinct_lines": 1,
                      "line_chars": 4, "distinct_line_chars": 1}


def test_duplicate_line_signals_empty_text(spark):
    # split('') -> [''] in both Spark and the SQL oracles: one empty line
    got = _sig_rows(spark, [(1, "")])
    assert got[1] == {"doc_id": 1, "n_lines": 1, "n_distinct_lines": 1,
                      "line_chars": 0, "distinct_line_chars": 0}


def test_space_separator_words_as_lines(spark):
    got = _sig_rows(spark, [(1, "to be or not to be")], sep=" ")
    # 6 words, 4 distinct; chars 2+2+2+3+2+2=13, distinct 2+2+2+3=9
    assert got[1] == {"doc_id": 1, "n_lines": 6, "n_distinct_lines": 4,
                      "line_chars": 13, "distinct_line_chars": 9}


def _grams(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r.doc_id: r.asDict()
            for r in top_bigram_stats(df, "text", "doc_id").collect()}


def test_top_bigram_hand_computed(spark):
    got = _grams(spark, [
        # bigrams: "the cat","cat sat","sat the","the cat" -> top
        # "the cat" x2 (len 7), 4 total
        (1, "The cat sat, the cat!"),
        (2, "hello"),        # 1 token -> 0 bigrams, zeros
        (3, ""),             # 0 tokens -> 0 bigrams, zeros
        (4, "a b a b a"),    # "a b" x2 vs "b a" x2: tie -> lexic.-last
    ])
    assert got[1] == {"doc_id": 1, "n_bigrams": 4,
                      "top_bigram_count": 2, "top_bigram_len": 7}
    assert got[2] == {"doc_id": 2, "n_bigrams": 0,
                      "top_bigram_count": 0, "top_bigram_len": 0}
    assert got[3] == {"doc_id": 3, "n_bigrams": 0,
                      "top_bigram_count": 0, "top_bigram_len": 0}
    assert got[4] == {"doc_id": 4, "n_bigrams": 4,
                      "top_bigram_count": 2, "top_bigram_len": 3}


def test_every_document_gets_a_row(spark):
    rows = [(i, "x" if i % 3 == 0 else "spam spam spam")
            for i in range(50)]
    out = _grams(spark, rows)
    assert len(out) == 50
    assert all(out[i]["top_bigram_count"] == (0 if i % 3 == 0 else 2)
               for i in range(50))


def test_top_bigram_no_python_udf_in_plan(spark):
    """The hot path must stay JVM-side: explode + hash-aggregate +
    window, no BatchEvalPython / ArrowEvalPython."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = top_bigram_stats(df, "text", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def _redact(spark, texts):
    from fastfilter_spark.functions.text import pii_counts, redact_pii
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, t string")
    counts = pii_counts(F.col("t"))
    out = df.select("i", redact_pii(F.col("t")).alias("r"),
                    *[c.alias(n) for n, c in counts.items()])
    return [r.asDict() for r in out.orderBy("i").collect()]


def test_pii_redaction_each_kind(spark):
    rows = _redact(spark, [
        "mail a.b+c@sub.example.co.uk now",
        "server at 192.168.1.254 down",
        "call +1 (555) 010-0199 today",
        "clean text with no pii at all",
    ])
    assert rows[0]["r"] == "mail <EMAIL> now"
    assert rows[0]["n_email"] == 1 and rows[0]["n_ipv4"] == 0
    assert rows[1]["r"] == "server at <IP> down"
    assert rows[1]["n_ipv4"] == 1
    assert rows[2]["r"] == "call <PHONE> today"
    assert rows[2]["n_phone"] == 1
    assert rows[3]["r"] == rows[3]["r"] == "clean text with no pii at all"
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) \
        == (0, 0, 0)


def test_pii_ordered_attribution(spark):
    """Digits inside an email's host must not double-count as IP/phone:
    counting runs on the earlier patterns' replaced text."""
    rows = _redact(spark, ["x 10.0.0.1@10.0.0.2.ab y 10.0.0.3 z"])
    r = rows[0]
    assert r["n_email"] == 1 and r["n_ipv4"] == 1
    assert r["r"] == "x <EMAIL> y <IP> z"


def test_pii_multiple_matches_counted(spark):
    rows = _redact(spark, ["a@b.cc c@d.ee 1.2.3.4 5.6.7.8 5551234567"])
    r = rows[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 2, 1)
    assert r["r"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"


def test_pii_plan_is_jvm_only(spark):
    from fastfilter_spark.functions.text import pii_counts, redact_pii
    df = spark.createDataFrame([(1, "a@b.cc")], "i int, t string")
    counts = pii_counts(F.col("t"))
    plan = df.select(redact_pii(F.col("t")),
                     *[c.alias(n) for n, c in counts.items()]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Token-budget mixture sampling
# ---------------------------------------------------------------------------

def test_token_budget_mix_semantics(spark):
    from fastfilter_spark.functions.text import token_budget_mix
    rows = [(i, f"doc {i}", "a" if i < 6 else "b", 100) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id int, text string, "
                                     "source string, toks int")
    # budget 250 -> greedy keeps docs while started under budget:
    # cum 100,200,300 -> third doc STARTS at 200 < 250 (kept, crossing),
    # fourth starts at 300 (dropped).  Source 'b' has no budget -> gone.
    out = token_budget_mix(df, "source", "toks", {"a": 250},
                           order_col=F.col("doc_id"))
    got = sorted((r.source, r.doc_id) for r in out.collect())
    assert got == [("a", 0), ("a", 1), ("a", 2)]


def test_token_budget_mix_partition_invariant(spark):
    from fastfilter_spark.functions.text import token_budget_mix
    rows = [(i, f"text {i % 7} {i}", f"s{i % 3}", 10 + i % 5)
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id int, text string, "
                                     "source string, toks int")
    budgets = {"s0": 90, "s1": 55, "s2": 200}
    a = token_budget_mix(df.repartition(1), "source", "toks", budgets)
    b = token_budget_mix(df.repartition(13, "text"), "source", "toks",
                         budgets)
    ga = sorted(r.doc_id for r in a.collect())
    gb = sorted(r.doc_id for r in b.collect())
    assert ga == gb and len(ga) > 0
    # every budgeted source reaches its budget (enough data exists)
    sums = {r.source: r.s for r in
            a.groupBy("source").agg(F.sum("toks").alias("s")).collect()}
    assert all(sums[s] >= budgets[s] for s in budgets)


# ---------------------------------------------------------------------------
# token n-grams + n-gram decontamination
# ---------------------------------------------------------------------------

def test_token_ngrams_values_and_edges(spark):
    from fastfilter_spark.functions.text import token_ngrams
    df = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "too short"), (3, "")],
        "i int, t string")
    got = {r.i: r.g for r in
           df.select("i", token_ngrams(F.col("t"), 3).alias("g"))
           .collect()}
    assert got[1] == ["the quick brown", "quick brown fox"]
    assert got[2] == []
    assert got[3] == []


def test_ngram_decontaminate_planted(spark):
    """An eval question EMBEDDED inside a longer train page must be
    caught (the case exact-text decontamination misses)."""
    from fastfilter_spark.operators.dedup import ngram_decontaminate
    q = "what is the airspeed velocity of an unladen swallow"
    train = spark.createDataFrame([
        (1, f"intro text here {q} and a long tail of words"),
        (2, "a completely unrelated document about spark shuffles"),
        (3, "another clean page that shares nothing with the evals"),
    ], "doc_id long, text string")
    ev = spark.createDataFrame([(100, q)], "doc_id long, text string")

    clean = ngram_decontaminate(train, ev, n=5)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3]
    cont = ngram_decontaminate(train, ev, n=5, invert=True)
    assert [r.doc_id for r in cont.collect()] == [1]


def test_ngram_decontaminate_n_larger_than_eval(spark):
    """Eval docs shorter than n contribute no grams: nothing removed."""
    from fastfilter_spark.operators.dedup import ngram_decontaminate
    train = spark.createDataFrame(
        [(1, "short shared words here")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "short shared")],
                               "doc_id long, text string")
    out = ngram_decontaminate(train, ev, n=4)
    assert out.count() == 1


def test_token_budget_mix_twophase_equals_single_phase(spark):
    from fastfilter_spark.functions.text import (
        token_budget_mix, token_budget_mix_twophase,
    )
    rows = [(i, f"w{i % 11} t{i}", f"s{i % 2}", 5 + i % 9)
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id int, text string, "
                                     "source string, toks int")
    for budgets in ({"s0": 300, "s1": 170},
                    {"s0": 1}, {"s0": 10**9, "s1": 7}):
        a = sorted(r.doc_id for r in
                   token_budget_mix(df, "source", "toks", budgets)
                   .collect())
        b = sorted(r.doc_id for r in
                   token_budget_mix_twophase(df, "source", "toks",
                                             budgets).collect())
        assert a == b, budgets
    # 16^1 = 16 buckets exercises multi-row boundary buckets
    a = sorted(r.doc_id for r in
               token_budget_mix(df, "source", "toks", {"s0": 444})
               .collect())
    b = sorted(r.doc_id for r in
               token_budget_mix_twophase(df, "source", "toks",
                                         {"s0": 444}, bucket_chars=1)
               .collect())
    assert a == b


def test_token_budget_mix_twophase_plan(spark):
    """Stats join must be broadcast; the corpus-sized full-keep branch
    must not pass through any Window node."""
    from fastfilter_spark.functions.text import token_budget_mix_twophase
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit("s0").alias("source"),
        (F.col("id") % 7 + 1).alias("toks"))
    out = token_budget_mix_twophase(df, "source", "toks", {"s0": 500})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_pii_phone_precision_numeric_prose_untouched(spark):
    """Digit runs with spaces but no phone marker (no +, parens, or
    double dash, not a 9+ digit bare run) must NOT be redacted."""
    rows = _redact(spark, [
        "revenue was 2021 2022 2023 respectively",
        "table row 10 20 30 40 50 total",
        "(555) 010-0199 and 555-010-0199 and 5551234567",
    ])
    assert rows[0]["r"] == "revenue was 2021 2022 2023 respectively"
    assert rows[0]["n_phone"] == 0
    assert rows[1]["r"] == "table row 10 20 30 40 50 total"
    assert rows[2]["r"] == "<PHONE> and <PHONE> and <PHONE>"
    assert rows[2]["n_phone"] == 3
