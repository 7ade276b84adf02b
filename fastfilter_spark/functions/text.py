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
