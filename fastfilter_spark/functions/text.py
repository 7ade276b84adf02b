"""Text-analysis functions for training-data pipelines over `documents`
/ `webpages` tables: token counting, quality scoring, language ID,
fingerprinting.

Everything that CAN be a built-in Column expression IS one (JVM-side,
whole-stage codegen, DuckDB-oracle-able); Python appears only for the
n-gram language-ID heuristic and simhash, as Arrow-vectorized pandas
UDFs.  The reference library has no text layer (it consumes pre-hashed
uint64 keys, /root/reference/README.md:25-29); these operators feed its
filters/sketches from raw text at 100 TB scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import LongType, StringType

from fastfilter_spark.functions import kernels as K

# ---------------------------------------------------------------------------
# token counting (JVM built-ins)
# ---------------------------------------------------------------------------

def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank string counts 0."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


_WORDISH = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks —
    the standard pre-tokenizer regex shape."""
    return F.size(F.regexp_extract_all(col, F.lit(_WORDISH), 0)).cast("long")


# ---------------------------------------------------------------------------
# quality scoring (JVM built-ins)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "with", "on")


def punct_chars(text_col: Column) -> Column:
    """Count of punctuation chars — neither alnum nor whitespace
    (codegen-able; the integer numerator of quality_columns'
    punct_ratio)."""
    return (F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[^A-Za-z0-9\s]", ""))).cast("long")


def stopword_hits(text_col: Column) -> Column:
    """Count of stopword tokens (codegen-able; the integer numerator of
    quality_columns' stopword_ratio)."""
    return F.size(F.array_remove(F.transform(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda w: F.when(w.isin(*_STOPWORDS), w).otherwise(F.lit("_"))),
        "_")).cast("long")


def quality_columns(text_col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword quality features, all codegen-able.

    Returns named Columns; callers select the subset they need so column
    pruning stays effective.
    """
    n_chars = F.length(text_col).cast("long")
    n_tokens = token_count(text_col)
    n_punct = punct_chars(text_col)
    stop_hits = stopword_hits(text_col)
    mean_token_len = F.when(n_tokens > 0,
                            (n_chars - (n_tokens - 1)) / n_tokens).otherwise(0.0)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0),
        "mean_token_len": mean_token_len,
    }


def quality_score(text_col: Column) -> Column:
    """Scalar [0,1] quality heuristic: length in a sane band, some
    stopwords, not punctuation-soup.  Deterministic and cheap; meant for
    threshold filtering before expensive downstream stages."""
    q = quality_columns(text_col)
    len_ok = F.when((q["n_tokens"] >= 5) & (q["n_tokens"] <= 100000), 1.0).otherwise(0.2)
    stop_ok = F.least(q["stopword_ratio"] * 4, F.lit(1.0))
    punct_ok = F.when(q["punct_ratio"] < 0.3, 1.0).otherwise(0.3)
    return (len_ok * 0.4 + stop_ok * 0.4 + punct_ok * 0.2)


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def doc_fingerprint(text_col: Column) -> Column:
    """Exact content fingerprint: md5 hex of the utf-8 bytes (SQL-portable:
    DuckDB md5() produces the same hex)."""
    return F.md5(F.encode(text_col, "UTF-8"))


def content_key(text_col: Column) -> Column:
    """64-bit content key for filters/sketches: xxhash64 (JVM)."""
    return F.xxhash64(text_col)


def simhash_udf(shingle_k: int = 3):
    """64-bit SimHash over character k-gram hashes (Arrow-vectorized).

    Near-duplicate texts land within small hamming distance; used by
    operators/dedup.py's simhash path.
    """

    @F.pandas_udf(LongType())
    def simhash(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int64)
        for i, txt in enumerate(s.fillna("").to_numpy()):
            b = txt.encode("utf-8", "surrogatepass")
            if len(b) < shingle_k:
                grams = np.frombuffer(b.ljust(shingle_k, b"\0"), dtype=np.uint8)
                grams = grams.astype(np.uint64)[None, :]
            else:
                a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                grams = np.lib.stride_tricks.sliding_window_view(a, shingle_k)
            # pack k bytes into one uint64 then murmur-mix
            packed = np.zeros(grams.shape[0], dtype=np.uint64)
            for j in range(shingle_k):
                packed = (packed << np.uint64(8)) | grams[:, j]
            h = K.murmur64(packed)
            # vote per bit
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - grams.shape[0]
            sh = np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return simhash


# ---------------------------------------------------------------------------
# language identification (n-gram heuristic, pandas UDF)
# ---------------------------------------------------------------------------

# tiny per-language marker profiles: common function words.  A heuristic,
# not a model — deterministic and dependency-free.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "por", "para"},
    "pt": {"o", "os", "e", "não", "um", "uma", "para", "com", "por", "mais"},
    "ru": {"и", "в", "не", "на", "что"},
}


def lang_id_udf():
    """Heuristic language ID from stopword hits; 'und' when nothing matches.

    At scale this runs as one Arrow batch pass with a per-language set
    lookup; swap for fastText/CLD3 outside this container.
    """

    @F.pandas_udf(StringType())
    def lang_id(s: pd.Series) -> pd.Series:
        langs = list(_LANG_MARKERS)

        def one(txt: str) -> str:
            if not txt:
                return "und"
            words = txt.lower().split()
            if not words:
                return "und"
            best, best_hits = "und", 0
            for lg in langs:
                hits = sum(1 for w in words if w in _LANG_MARKERS[lg])
                if hits > best_hits:
                    best, best_hits = lg, hits
            return best

        return s.fillna("").map(one)

    return lang_id


# ---------------------------------------------------------------------------
# vocabulary / document frequency (JVM built-ins)
# ---------------------------------------------------------------------------

def word_tokens(text_col: Column) -> Column:
    """Lower-cased alphabetic tokens as ``array<string>`` — the
    SQL-portable tokenizer (split on non-letter runs, drop empties)
    used by vocabulary building and token-diversity scoring.  Pure
    codegen; a DuckDB oracle reproduces it with regexp_split + filter.
    """
    return F.filter(F.split(F.lower(text_col), r"[^a-z]+"),
                    lambda t: t != "")


def distinct_token_ratio_columns(text_col: Column) -> dict[str, Column]:
    """Token-diversity signals (Gopher-style repetition filters): total
    tokens and distinct tokens per document, both long.  A low
    distinct/total ratio marks boilerplate/keyword-stuffed pages;
    integer components are returned (not the float ratio) so exact
    oracles and lossless aggregation stay possible."""
    toks = word_tokens(text_col)
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
    }


def document_frequency(df, text_col: str = "text",
                       min_df: int = 1):
    """(token, df) — number of DOCUMENTS containing each token (not
    term frequency): explode the per-document DISTINCT token set, then
    one hash-aggregate.  The distinct-before-explode keeps the shuffle
    at O(vocabulary x docs-containing), immune to within-document
    repetition; token keys are zipf-skewed but partial (map-side)
    aggregation absorbs the head before the exchange, so no salting is
    needed for a count-only agg.  IDF = ln(N/df) is left to the caller
    (floats would break exact oracle comparison; df is exact).
    """
    tok = df.select(F.explode(F.array_distinct(word_tokens(F.col(text_col))))
                    .alias("token"))
    out = tok.groupBy("token").agg(F.count("*").alias("df"))
    return out.where(F.col("df") >= min_df) if min_df > 1 else out


def stratified_sample(df, strata_cols: list[str], n_per_stratum: int,
                      order_col: Column | None = None):
    """Deterministic n-per-group sample: rank rows inside each stratum
    by a content hash (md5 of the row's ``order_col``, uniform and
    engine-portable) and keep the first ``n_per_stratum``.

    The standard training-mix op ("k docs per (lang, source) cell").
    Window row_number is one shuffle on the strata key; per-group state
    is O(1).  For pathologically hot single strata at 10^12 rows, a
    two-phase pre-rank (per-partition top-n via the same window over
    (stratum, partition_id), then the final window over winners — at
    most n x partitions rows per stratum) bounds task input; that
    refinement is a caller-side composition of this same function.
    """
    from pyspark.sql import Window
    # default rank key: md5 over ALL columns, serialized as JSON — a
    # per-row hash (hashing only the strata cols would rank every row
    # in a stratum equal and leave the sample to shuffle order).  JSON,
    # not concat_ws: concat_ws SKIPS null columns, so (x, NULL) and
    # (NULL, x) — or values containing the separator — would collide on
    # the rank key and re-introduce shuffle-order dependence for the
    # tied rows.  to_json keeps field names and escapes values, so
    # distinct rows get distinct keys.  Pass order_col to rank by a
    # single stable column (e.g. md5(text)) for cross-engine oracles.
    order = order_col if order_col is not None else F.md5(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    w = Window.partitionBy(*strata_cols).orderBy(order)
    return (df.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= n_per_stratum).drop("_rank"))


def dedup_lines(text_col: Column, sep: str = "\n") -> Column:
    """Remove repeated lines WITHIN a document, keeping each line's
    first occurrence in original order (the RefinedWeb/Gopher
    intra-document repetition-removal pass; the reference library has
    no text layer — this feeds its filters cleaner keys).

    Pure JVM whole-stage codegen: split → array_distinct → array_join.
    ``array_distinct`` preserves first-occurrence order, so no shuffle,
    no window, no UDF — per-row cost only, which is the only shape that
    survives 10^12 documents (any per-line exchange would shuffle the
    whole corpus).  ``sep`` is a literal separator (escaped into the
    split regex): '\\n' for real pages; tests/oracles may pass ' ' to
    treat words as lines on single-line corpora.
    """
    import re as _re
    return F.array_join(
        F.array_distinct(F.split(text_col, _re.escape(sep))), sep)


def repetition_signal_columns(text_col: Column,
                              sep: str = "\n") -> dict[str, Column]:
    """Integer components of the Gopher duplicate-line repetition
    filters (Rae et al. 2021 §A1.1: "fraction of duplicate lines" and
    "fraction of characters in duplicate lines"; the reference library
    has no text layer — these gate which documents feed its filters).

    Returned per document, all ``long`` so oracles compare exactly and
    sums stay lossless (the caller derives the fractions):

    - ``n_lines`` / ``n_distinct_lines`` — dup-line fraction is
      ``1 - distinct/total``;
    - ``line_chars`` / ``distinct_line_chars`` — characters over all
      lines vs over each line's FIRST occurrence only, so the dup-char
      fraction weights long boilerplate lines properly.

    Pure JVM codegen (split / array_distinct / aggregate) — per-row
    cost, zero shuffle, the only shape that survives 10^12 documents.
    ``sep`` as in :func:`dedup_lines` (' ' on single-line corpora).
    """
    import re as _re
    lines = F.split(text_col, _re.escape(sep))
    firsts = F.array_distinct(lines)
    chars = lambda arr: F.aggregate(  # noqa: E731 — local shorthand
        arr, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"))
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_distinct_lines": F.size(firsts).cast("long"),
        "line_chars": chars(lines),
        "distinct_line_chars": chars(firsts),
    }


def top_bigram_stats(df, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-document most-frequent word 2-gram (the Gopher "fraction of
    characters in the most common n-gram" filter's integer pieces).

    Returns ``(id_col, n_bigrams, top_bigram_count, top_bigram_len)``
    with one row per input document; documents with < 2 tokens get
    zeros.  The top gram is tie-broken deterministically (highest
    count, then lexicographically-last gram — ``max(struct(cnt,
    gram))`` orders exactly that way) so Spark and a SQL oracle agree
    row-for-row.

    Plan shape at corpus scale, three wide steps (stated honestly):
    (1) exploded bigrams hash-aggregate on (doc, gram) — the exchange
    carries distinct bigrams only, map-side combine absorbing exactly
    the repeats this filter hunts, so the worst documents shrink the
    most; (2) the per-doc argmax is a second hash aggregate keyed by
    doc (``max(struct)``, partially aggregated map-side — cheaper than
    a window, which would add a sort); (3) the zero-gram left join
    back to the id spine exchanges (id, n_bigrams) pairs — 16-byte
    rows, skew-free on the unique id.  No per-row Python anywhere.
    """
    toks = word_tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i),
                        F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))

    base = df.select(F.col(id_col), grams.alias("_grams"))
    counted = (base.select(id_col, F.explode("_grams").alias("gram"))
               .groupBy(id_col, "gram").agg(F.count("*").alias("cnt")))
    top = (counted.groupBy(id_col)
           .agg(F.max(F.struct("cnt", "gram")).alias("_top"))
           .select(id_col,
                   F.col("_top.cnt").alias("top_bigram_count"),
                   F.length("_top.gram").cast("long")
                   .alias("top_bigram_len")))
    totals = base.select(id_col,
                         F.size("_grams").cast("long").alias("n_bigrams"))
    return (totals.join(top, id_col, "left")
            .select(id_col, "n_bigrams",
                    F.coalesce("top_bigram_count", F.lit(0))
                    .cast("long").alias("top_bigram_count"),
                    F.coalesce("top_bigram_len", F.lit(0))
                    .cast("long").alias("top_bigram_len")))


# PII redaction patterns, ordered: email first (its local part may
# contain digit runs the later patterns would mangle), then IPv4, then
# phone-like digit runs.  Kept to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracles): character classes,
# bounded repetition, \b — no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone spans must carry a phone-shaped MARKER — a leading '+', a
    # parenthesized prefix, >=2 dash separators, or a 9-14 digit bare
    # run.  A naive "digits/spaces, length >= 9" class would redact
    # ordinary numeric prose ("revenue was 2021 2022 2023", table
    # rows) as <PHONE>, corrupting clean training text; plain
    # space-separated digit groups with no marker are left alone (the
    # documented recall trade of pattern-based scrubbing).
    ("phone",
     r"\+\d[\d()\- ]{7,}\d"
     r"|\(\d{1,4}\)[\- ]?\d[\d\- ]{4,}\d"
     r"|\d{2,4}(?:-\d{2,4}){2,}"
     r"|\b\d{9,14}\b",
     "<PHONE>"),
]


def redact_pii(text_col: Column) -> Column:
    """Replace email / IPv4 / phone-shaped spans with typed tokens
    (``<EMAIL>``, ``<IP>``, ``<PHONE>``) — the standard scrub pass a
    web corpus takes before training.  Three chained JVM
    ``regexp_replace`` calls: per-row codegen, zero shuffle, no
    Python.  Pattern-based scrubbing is recall-bounded by its regexes
    (that is the industry-standard trade-off at 10^12 documents; ML
    NER passes are orders of magnitude more compute)."""
    out = text_col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-document match counts for each PII pattern (long), for
    corpus audit dashboards and redaction-rate monitoring.  Counted on
    the ORIGINAL text with the same ordered-replacement semantics as
    :func:`redact_pii`: each pattern is counted on the text with the
    EARLIER patterns' spans already replaced, so an address inside an
    email is attributed to the email, exactly once."""
    masked = text_col
    counts: dict[str, Column] = {}
    for name, pat, token in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(masked, F.lit(pat), 0)).cast("long")
        masked = F.regexp_replace(masked, pat, token)
    return counts


def token_budget_mix(df, source_col: str, token_col: str,
                     budgets: dict[str, int],
                     order_col: Column | None = None):
    """Training-mix construction: per source, keep documents in a
    deterministic hash order until that source's TOKEN budget is
    filled (the "sample source X down to N tokens" step that turns a
    filtered corpus into a weighted training mixture).

    A document is kept while the budget is not yet exhausted when it
    starts (``cumulative - own <  budget``), so the crossing document
    is included and every source with enough data reaches >= its
    budget; sources not in ``budgets`` are dropped.

    One shuffle (window over the source key).  Per-group state is the
    running sum only.  Sources are few and docs per source huge, so
    the window partition is the hot spot at corpus scale; the standard
    refinement — pre-aggregate per (source, partition) token sums,
    compute partition-level cumulative offsets on that tiny table, and
    window only inside the boundary partition — composes from this
    same function applied twice and is left to the caller (same
    pattern as stratified_sample's two-phase note).
    """
    from pyspark.sql import Window

    if "_cum" in df.columns:
        # withColumn below would silently replace and then drop it
        raise ValueError("column '_cum' is used internally by "
                         "token_budget_mix; rename it first")
    order = order_col if order_col is not None else F.md5(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    # explicit ROWS frame + unique tiebreak: RANGE (the default frame)
    # would lump hash ties, making inclusion depend on tie-group sums
    w = (Window.partitionBy(source_col)
         .orderBy(order, F.col(token_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bmap = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    cum = F.sum(F.col(token_col)).over(w)
    budget = bmap[F.col(source_col)]
    return (df.withColumn("_cum", cum)
            .where(budget.isNotNull()
                   & ((F.col("_cum") - F.col(token_col)) < budget))
            .drop("_cum"))


def token_ngrams(text_col: Column, n: int) -> Column:
    """Token n-grams as space-joined strings (``array<string>``;
    empty when the document has < n tokens).  Pure JVM transform over
    :func:`word_tokens` — per-row codegen, no explode, no Python; the
    caller decides if/when to explode."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = word_tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def token_budget_mix_twophase(df, source_col: str, token_col: str,
                              budgets: dict[str, int],
                              order_col: Column | None = None,
                              bucket_chars: int = 2):
    """Hot-source form of :func:`token_budget_mix`, same selection
    bit-for-bit (tested): when one source holds most of the corpus, a
    single window partition would funnel it through one task.  Split
    the hash order into ``16^bucket_chars`` prefix buckets (a hash
    prefix is order-preserving, so bucket boundaries respect the
    global order), then:

    1. per-(source, bucket) token sums — a tiny map-side-combined agg;
    2. cumulative bucket offsets per source on that stats table;
    3. buckets that END under budget are kept WHOLE with no window
       and no shuffle (broadcast join against the stats table only);
       buckets that START at/past budget drop entirely; only the
       boundary bucket(s) — ~corpus/buckets rows per source — pay the
       within-bucket window, with the bucket offset added.

    The corpus-sized data therefore never enters a window; the only
    row shuffle is the boundary slice.
    """
    from pyspark.sql import Window

    order = order_col if order_col is not None else F.md5(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    bmap = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    for helper in ("_tbm_ord", "_tbm_bkt", "_tbm_off", "_tbm_sum",
                   "_tbm_cum"):
        if helper in df.columns:
            raise ValueError(f"column {helper!r} is used internally; "
                             "rename it first")
    keyed = (df.where(bmap[F.col(source_col)].isNotNull())
             .withColumn("_tbm_ord", order)
             .withColumn("_tbm_bkt", F.substring("_tbm_ord", 1,
                                                 bucket_chars)))
    stats = (keyed.groupBy(source_col, "_tbm_bkt")
             .agg(F.sum(token_col).alias("_tbm_sum")))
    woff = (Window.partitionBy(source_col).orderBy("_tbm_bkt")
            .rowsBetween(Window.unboundedPreceding, -1))
    stats = stats.withColumn(
        "_tbm_off", F.coalesce(F.sum("_tbm_sum").over(woff), F.lit(0)))
    budget = bmap[F.col(source_col)]

    joined = keyed.join(F.broadcast(stats), [source_col, "_tbm_bkt"])
    helpers = ["_tbm_ord", "_tbm_bkt", "_tbm_off", "_tbm_sum"]
    # whole buckets strictly under budget: no window, no shuffle
    full = joined.where(
        (F.col("_tbm_off") + F.col("_tbm_sum")) < budget).drop(*helpers)
    # boundary bucket(s): window only this slice, offset added
    wcum = (Window.partitionBy(source_col, "_tbm_bkt")
            .orderBy("_tbm_ord", F.col(token_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bdry = (joined.where(
        (F.col("_tbm_off") < budget)
        & ((F.col("_tbm_off") + F.col("_tbm_sum")) >= budget))
        .withColumn("_tbm_cum",
                    F.col("_tbm_off") + F.sum(F.col(token_col)).over(wcum))
        .where((F.col("_tbm_cum") - F.col(token_col)) < budget)
        .drop("_tbm_cum", *helpers))
    return full.unionByName(bdry)
