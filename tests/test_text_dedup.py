"""Text functions + dedup ladder + ANN + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.functions.text import (
    bpe_ish_token_count, doc_fingerprint, lang_id_udf, quality_columns,
    quality_score, simhash_udf, token_count,
)
from fastfilter_spark.operators.dedup import (
    embedding_near_dup, exact_dedup, duplicate_groups, lsh_candidates,
    minhash_dedup_pairs, minhash_signature_fast_udf, minhash_signature_udf,
    simhash_pairs, verify_jaccard,
)
from fastfilter_spark.operators.similarity import (
    IVFIndex, brute_force_topk, pairwise_topk_join,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# -- text functions ----------------------------------------------------------

def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",), ("a  b   c",)], ["t"])
    got = [r[0] for r in df.select(token_count(F.col("t"))).collect()]
    assert got == [0, 0, 1, 2, 3]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world!",), ("a-b c",)], ["t"])
    got = [r[0] for r in df.select(bpe_ish_token_count(F.col("t"))).collect()]
    assert got == [4, 4]  # hello , world ! | a - b c


def test_quality_columns(spark, docs):
    q = quality_columns(F.col("text"))
    row = docs.select(*[c.alias(n) for n, c in q.items()],
                      quality_score(F.col("text")).alias("score")).first()
    assert row["n_chars"] > 0 and 0 <= row["punct_ratio"] <= 1
    assert 0 <= row["score"] <= 1


def test_doc_fingerprint_matches_duckdb(spark, docs, sf_dir):
    import duckdb
    ours = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    theirs = dict(duckdb.sql(
        f"SELECT doc_id, md5(text) FROM '{sf_dir}/documents.parquet'").fetchall())
    assert ours == theirs


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame([
        ("the cat sat on the mat and it is fine",),
        ("der hund ist nicht zu hause und die katze",),
        ("le chat est dans la maison pour les vacances",),
        ("xyzzy qwerty",),
    ], ["t"])
    got = [r[0] for r in df.select(lang_id_udf()(F.col("t"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_simhash_near_for_near_texts(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("lazy", "sleepy")),
         (3, "completely different content about spark engines")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["sh"] for r in
            df.select("doc_id", simhash_udf()(F.col("text")).alias("sh")).collect()}
    d12 = bin((rows[1] ^ rows[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    d13 = bin((rows[1] ^ rows[3]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert d12 < d13


# -- dedup -------------------------------------------------------------------

@pytest.fixture(scope="module")
def dup_docs(spark):
    """60 base docs; 0-19 duplicated exactly; 20-29 near-duplicated."""
    rows = []
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu"]
    for i in range(60):
        words = [vocab[int(x)] for x in rng.integers(0, len(vocab), 40)]
        rows.append((i, " ".join(words)))
    for i in range(20):        # exact dups
        rows.append((100 + i, rows[i][1]))
    for i in range(20, 30):    # near dups: one word changed
        words = rows[i][1].split()
        words[5] = "OMEGA"
        rows.append((200 + i, " ".join(words)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, dup_docs):
    assert dup_docs.count() == 90
    assert exact_dedup(dup_docs).count() == 70
    groups = duplicate_groups(dup_docs).collect()
    assert len(groups) == 20
    assert all(r["n_docs"] == 2 for r in groups)


def test_minhash_exact_vs_fast_udf(spark, dup_docs):
    slow = dup_docs.limit(5).select(
        "doc_id", minhash_signature_udf(32, 5)(F.col("text")).alias("s"))
    fast = dup_docs.limit(5).select(
        "doc_id", minhash_signature_fast_udf(32, 5)(F.col("text")).alias("s"))
    a = {r["doc_id"]: r["s"] for r in slow.collect()}
    b = {r["doc_id"]: r["s"] for r in fast.collect()}
    assert a == b


def test_minhash_dedup_finds_near_dups(spark, dup_docs):
    pairs = minhash_dedup_pairs(dup_docs, threshold=0.5,
                                n_hashes=64, bands=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # each near-dup pair (i, 200+i) must be found
    for i in range(20, 30):
        assert (i, 200 + i) in found, (i, sorted(found))
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_lsh_estimate_close_to_exact(spark, dup_docs):
    cand = lsh_candidates(dup_docs, n_hashes=64, bands=16)
    verified = verify_jaccard(cand, dup_docs).collect()
    for r in verified:
        assert abs(r["est_jaccard"] - r["jaccard"]) < 0.35


def test_simhash_pairs(spark, dup_docs):
    pairs = simhash_pairs(dup_docs, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hits = sum((i, 200 + i) in found for i in range(20, 30))
    assert hits >= 7  # heuristic; most one-word edits land within radius


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(30)]
    # 5 near-dups: tiny perturbation of vectors 0..4
    for i in range(5):
        rows.append((100 + i, (base[i] + 0.01 * rng.standard_normal(16)
                               .astype(np.float32)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup(df, threshold=0.98, n_planes=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hits = sum((i, 100 + i) in found for i in range(5))
    assert hits >= 3  # LSH recall is probabilistic; most must be found


# -- similarity search -------------------------------------------------------

def test_brute_force_topk_matches_numpy(spark, embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1]) for r in rows]).astype(np.float64)
    q = M[3] * 0.9
    got = brute_force_topk(embeddings, q.tolist(), k=5).collect()
    sims = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:5]
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in order]
    assert got[0]["vec_id"] == 3


def test_ivf_topk_recall(spark, embeddings):
    idx = IVFIndex.fit(embeddings, ncells=8, sample_rows=600)
    assigned = idx.assign(embeddings).cache()
    rows = embeddings.limit(10).collect()
    recall_hits = 0
    for r in rows[:5]:
        q = list(r["embedding"])
        exact = {x["vec_id"] for x in brute_force_topk(embeddings, q, 5).collect()}
        approx = {x["vec_id"] for x in idx.search(assigned, q, 5, nprobe=3).collect()}
        recall_hits += len(exact & approx)
    assert recall_hits >= 15  # >=60% recall@5 with nprobe=3/8
    assigned.unpersist()


def test_pairwise_topk_join(spark, embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = pairwise_topk_join(embeddings, queries, k=4)
    got = out.groupBy("q_id").count().collect()
    assert all(r["count"] == 4 for r in got)
    # each query's own vector must be its top hit
    top = {r["q_id"]: r["vec_id"] for r in out.where(F.col("_rk") == 1).collect()} \
        if "_rk" in out.columns else None
    best = out.withColumn("_r", F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("q_id").orderBy(F.desc("cosine")))).where(F.col("_r") == 1)
    assert all(r["q_id"] == r["vec_id"] for r in best.collect())


def _find_parquet_scan(node):
    """Walk a physical plan across AQE wrappers/query stages (which are
    leaves holding an inner .plan()/.executedPlan()) to the file scan."""
    if "parquet" in node.nodeName().lower():
        return node
    for meth in ("executedPlan", "plan"):
        try:
            found = _find_parquet_scan(getattr(node, meth)())
        except Exception:
            found = None
        if found is not None:
            return found
    ch = node.children()
    for i in range(ch.size()):
        found = _find_parquet_scan(ch.apply(i))
        if found is not None:
            return found
    return None


def _scan_metrics(df):
    """(numFiles, numPartitions) of the executed plan's parquet scan."""
    df.collect()
    scan = _find_parquet_scan(df._jdf.queryExecution().executedPlan())
    assert scan is not None, "no parquet scan in plan"
    m = scan.metrics()
    return (m.apply("numFiles").value(),
            m.apply("numPartitions").value())


def test_ivf_batch_search_prunes_partitions_and_matches_search(
        spark, embeddings, tmp_path):
    ncells, nprobe = 8, 2
    idx = IVFIndex.fit(embeddings, ncells=ncells, sample_rows=600)
    path = str(tmp_path / "ivf")
    # the scale layout the index prescribes: cell as the partition key
    idx.assign(embeddings).write.partitionBy("cell").parquet(path)
    table = spark.read.parquet(path)

    qrows = embeddings.limit(3).collect()
    queries = spark.createDataFrame(
        [(r["vec_id"], list(r["embedding"])) for r in qrows],
        "q_id long, q_vec array<float>")
    out = idx.batch_search(table, queries, k=5, nprobe=nprobe)

    # 1) per-query results identical to the per-query search path
    got = {(r["q_id"], r["vec_id"]): r["cosine"] for r in out.collect()}
    for r in qrows:
        per_q = idx.search(table, list(r["embedding"]), k=5,
                           nprobe=nprobe).collect()
        # numpy BLAS vs the JVM fold sum in a different order: scores
        # agree to float tolerance, membership and ranking exactly
        for x in per_q:
            assert abs(got[(r["vec_id"], x["vec_id"])]
                       - x["cosine"]) < 1e-6
        assert len([1 for (q, _) in got if q == r["vec_id"]]) == len(per_q)

    # 2) the scan reads ONLY the union of the queries' probe cells —
    #    file count drops by ~ncells/nprobe on the partitioned table
    full_files, total_parts = _scan_metrics(table)
    assert total_parts == ncells
    pruned_files, pruned_parts = _scan_metrics(out)
    assert nprobe <= pruned_parts <= 3 * nprobe  # union over 3 queries
    assert pruned_files <= full_files * pruned_parts / ncells + 1e-9


# -- multimodal --------------------------------------------------------------

def test_multimodal_plumbing(spark):
    from fastfilter_spark.operators.multimodal import (
        audio_frame_sample, image_features, synthesize_media)
    media = synthesize_media(spark, 50, kind="image")
    assert media.count() == 50
    feats = image_features(media, decode="fake")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(0 <= r["mean_pixel"] <= 255 for r in rows)
    # determinism across partitionings
    media2 = synthesize_media(spark, 50, kind="image").repartition(7)
    rows2 = image_features(media2, decode="fake").collect()
    assert {r["media_id"]: r["phash"] for r in rows} == \
        {r["media_id"]: r["phash"] for r in rows2}

    audio = synthesize_media(spark, 10, kind="audio")
    s = audio_frame_sample(audio, n_samples=8).collect()
    assert len(s) == 10 and all(len(r["samples"]) == 8 for r in s)


def test_multimodal_real_decode_rejects_non_png(spark):
    """decode='real' on synthetic (non-PNG) payloads fails loudly with
    the format error from the stdlib PNG decoder — never a silent fake
    decode.  (Real-PNG end-to-end lives in test_multimodal_real.py.)"""
    from fastfilter_spark.operators.multimodal import (
        image_features, synthesize_media)
    media = synthesize_media(spark, 3, kind="image")
    with pytest.raises(Exception, match="not a PNG"):
        image_features(media, decode="real").collect()


def test_oph_family_matches_exact_verified_pairs(spark, sf_dir):
    """The OPH signature family (default) must produce the same VERIFIED
    pair set as the exact mod-p family on this corpus (precision is
    exact either way; recall agrees here), and reject unknown
    families."""
    import pytest

    from fastfilter_spark.operators.dedup import (
        lsh_candidates, minhash_dedup_pairs)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    a = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(
        docs, threshold=0.7, n_hashes=64, family="oph").collect()}
    b = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(
        docs, threshold=0.7, n_hashes=64, family="exact").collect()}
    assert a == b
    with pytest.raises(ValueError, match="family"):
        lsh_candidates(docs, family="nope")


def test_oph_signature_properties(spark):
    """OPH signatures: deterministic, right width, identical docs agree
    fully, disjoint docs agree ~never, and tiny docs densify (no
    sentinel values)."""
    import numpy as np

    from fastfilter_spark.operators.dedup import minhash_signature_oph_udf
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 20),
         (1, "the quick brown fox jumps over the lazy dog " * 20),
         (2, "entirely different content with no overlap at all " * 20),
         (3, "tiny")],
        "doc_id long, text string")
    sig = minhash_signature_oph_udf(64, 5)
    rows = {r["doc_id"]: np.array(r["s"]) for r in
            docs.select("doc_id", sig(F.col("text")).alias("s")).collect()}
    assert all(v.size == 64 for v in rows.values())
    assert (rows[0] == rows[1]).all()                  # identical docs
    assert (rows[0] == rows[2]).mean() < 0.2           # disjoint docs
    assert (rows[3] < np.iinfo(np.int64).max).all()    # densified
    rows2 = {r["doc_id"]: np.array(r["s"]) for r in
             docs.select("doc_id", sig(F.col("text")).alias("s")).collect()}
    assert all((rows[k] == rows2[k]).all() for k in rows)
