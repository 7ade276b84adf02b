"""Sequence packing: python replay of the flat cumsum, two-phase ==
flat, gapless/overlap-free stream, plan shape, edges."""

import hashlib

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.operators.packing import pack_sequences


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_pack(rows, seq_len):
    """rows: [(id, ntok)] -> {id: (ntok, start, seq, off, end_seq)}
    via ONE flat ordered cumsum (the semantics oracle)."""
    live = sorted(((_h60(str(i)), i, w) for i, w in rows if w and w > 0),
                  key=lambda t: (t[0], t[1]))
    out, pos = {}, 0
    for _, i, w in live:
        out[i] = (w, pos, pos // seq_len, pos % seq_len,
                  (pos + w - 1) // seq_len)
        pos += w
    return out


def _rows(n, seed=3):
    import random
    rng = random.Random(seed)
    return [(i, rng.randint(1, 900)) for i in range(n)]


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "id long, ntok long")
    return df.repartition(parts) if parts else df


def test_matches_flat_cumsum_replay(spark):
    rows = _rows(200, seed=5)
    got = {r.id: (r.n_tokens, r.start_token, r.seq_id, r.offset_in_seq,
                  r.end_seq_id)
           for r in pack_sequences(_df(spark, rows), "id", "ntok",
                                   seq_len=2048).collect()}
    assert got == _py_pack(rows, 2048)


def test_bucket_counts_and_partitionings_agree(spark):
    rows = _rows(400, seed=7)
    outs = []
    for bits, parts in ((0, 1), (4, 13), (8, 3)):
        outs.append(sorted(map(tuple, pack_sequences(
            _df(spark, rows, parts), "id", "ntok", 512,
            bucket_bits=bits).collect())))
    assert outs[0] == outs[1] == outs[2]


def test_stream_is_gapless_and_overlap_free(spark):
    rows = _rows(300, seed=11)
    out = pack_sequences(_df(spark, rows), "id", "ntok", 128).collect()
    total = sum(w for _, w in rows)
    spans = sorted((r.start_token, r.n_tokens) for r in out)
    pos = 0
    for s, w in spans:
        assert s == pos
        pos += w
    assert pos == total


def test_nonpositive_and_null_tokens_excluded(spark):
    rows = [(1, 5), (2, 0), (3, None), (4, 7)]
    out = pack_sequences(_df(spark, rows), "id", "ntok", 4).collect()
    assert sorted(r.id for r in out) == [1, 4]
    assert sum(r.n_tokens for r in out) == 12


def test_long_doc_spans_sequences(spark):
    rows = [(1, 5000)]
    r = pack_sequences(_df(spark, rows), "id", "ntok", 2048).collect()[0]
    assert (r.start_token, r.seq_id, r.offset_in_seq, r.end_seq_id) \
        == (0, 0, 0, 2)


def test_guards(spark):
    df = _df(spark, _rows(5))
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "id", "ntok", 0)
    with pytest.raises(ValueError, match="already present"):
        pack_sequences(df.withColumn("_ff_h", F.lit(1)),
                       "id", "ntok", 16)


def test_plan_has_no_doc_level_single_partition_window(spark):
    df = _df(spark, _rows(500), 8)
    plan = pack_sequences(df, "id", "ntok", 1024) \
        ._jdf.queryExecution().executedPlan().toString()
    # the doc-level window must shuffle BY BUCKET; the only
    # SinglePartition exchange allowed is the 256-row offsets table
    assert "hashpartitioning(_ff_bucket" in plan
    doc_windows = [ln for ln in plan.splitlines()
                   if "Window" in ln and "_ff_cum" in ln]
    assert doc_windows, "doc-level window missing from plan"
    assert plan.count("SinglePartition") <= 1
