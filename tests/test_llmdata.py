"""LLM-data operators: dedup, similarity search, text stats, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydi_spark.llmdata import (
    brute_force_topk,
    document_fingerprint,
    exact_duplicates,
    language_id,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    quality_scores,
    simhash_near_duplicates,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "quick brown fox jumps over lazy dog the"),       # shuffled dup of 1
        (4, "completely different content about spark engines and joins"),
        (5, "der schnelle braune fuchs und der hund"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = {r["id"]: r for r in exact_duplicates(docs).collect()}
    assert out["2"]["is_duplicate"] and out["2"]["canonical_id"] == "1"
    assert not out["1"]["is_duplicate"]
    assert not out["3"]["is_duplicate"]  # different order => different hash


def test_minhash_finds_shuffled_dup(docs):
    out = {(r["id1"], r["id2"]) for r in
           minhash_near_duplicates(docs, num_hashes=16, bands=4,
                                   jaccard_threshold=0.9).collect()}
    assert ("1", "2") in out and ("1", "3") in out and ("2", "3") in out
    assert not any("4" in p for pair in out for p in pair)


def test_simhash_near_duplicates(docs):
    out = {(r["id1"], r["id2"]): r["hamming"] for r in
           simhash_near_duplicates(docs, max_hamming=0).collect()}
    assert out[("1", "2")] == 0 and out[("1", "3")] == 0  # same token set


def test_ngram_jaccard(docs):
    out = {(r["id1"], r["id2"]) for r in
           ngram_jaccard_duplicates(docs, shingle_size=3,
                                    jaccard_threshold=0.6).collect()}
    assert ("1", "2") in out
    assert ("1", "3") not in out  # shuffling destroys 3-gram shingles


def test_fingerprint_order_insensitive(docs):
    out = {r["doc_id"]: r["fingerprint"] for r in
           document_fingerprint(docs.withColumn("doc_id", F.col("doc_id").cast("string"))).collect()}
    assert out["1"] == out["3"]  # sorted-token fingerprint
    assert out["1"] != out["4"]


def test_token_counts_and_quality(docs):
    out = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert out[1]["n_tokens_ws"] == 9
    assert out[1]["n_tokens_distinct"] == 8  # 'the' twice
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert 0.0 <= q[1]["quality_score"] <= 1.0
    assert q[1]["stopword_ratio"] == pytest.approx(2 / 9)


def test_language_id(docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, df.where("vec_id = 0"), k=3)
    got = [(r["neighbor_id"]) for r in out.orderBy("rank").collect()]
    # numpy oracle
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm[0]
    sims[0] = -np.inf
    expect = np.argsort(np.round(-sims, 6), kind="stable")[:3]
    assert [int(g) for g in got] == [int(x) for x in expect]


def test_multimodal_plumbing(spark):
    from pydi_spark.llmdata.multimodal import (
        extract_features,
        fake_image_decoder,
        media_stats,
        sample_frames,
    )

    rows = [
        ("m1", "image", bytearray(b"x" * 64), "image/png", 4, 4, 0),
        ("m2", "video", bytearray(b"y" * 64), "video/mp4", 16, 16, 3500),
        ("m3", "image", None, "image/png", 4, 4, 0),  # broken payload
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_features(df, fake_image_decoder).collect()}
    assert feats["m1"]["decode_ok"] == "ok"
    assert len(feats["m1"]["feature"]) == 12
    assert feats["m3"]["decode_ok"].startswith("error")

    frames = sample_frames(df.where("media_type = 'video'"), every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]

    stats = {r["media_type"]: r["n"] for r in media_stats(df).collect()}
    assert stats == {"image": 2, "video": 1}


def test_ivf_topk_recall_vs_bruteforce(spark):
    from pydi_spark.llmdata import ivf_topk

    rng = np.random.default_rng(5)
    # clustered vectors so IVF cells are meaningful
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    vecs = np.concatenate(
        [centers[i % 4] + rng.standard_normal(8).astype(np.float32) * 0.3
         for i in range(80)]
    ).reshape(80, 8)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id < 4")
    exact = brute_force_topk(df, q, k=5)
    approx = ivf_topk(df, q, k=5, n_centroids=4, nprobe=2, sample_size=80)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, recall


def test_decode_and_resize(spark):
    from pydi_spark.llmdata.multimodal import decode_and_resize, fake_image_decoder

    rows = [("m1", bytearray(b"z" * 64)), ("m2", None)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in
           decode_and_resize(df, 8, 8, fake_image_decoder).collect()}
    assert out["m1"]["decode_ok"] == "ok"
    assert len(out["m1"]["pixels"]) == 8 * 8 * 3
    assert out["m2"]["decode_ok"].startswith("error")


def test_embedding_near_duplicates(spark):
    from pydi_spark.llmdata import embedding_near_duplicates

    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id1"], r["id2"]) for r in
           embedding_near_duplicates(df, threshold=0.99, method="brute").collect()}
    assert out == {("1", "2")}
