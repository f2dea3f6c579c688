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


def test_semantic_dedup_pairs(spark):
    import numpy as np

    from pydi_spark.llmdata.dedup import semantic_dedup_pairs

    # two tight planted clusters + noise; near-identical twins inside each
    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        base = np.zeros(8)
        base[i % 2] = 1.0
        v = base + rng.standard_normal(8) * 0.02
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # injected-centroid path: the two axis centroids scope the pairs
    cents = [[1.0] + [0.0] * 7, [0.0, 1.0] + [0.0] * 6]
    out = semantic_dedup_pairs(df, threshold=0.99, centroids=cents).collect()
    assert out, "tight planted twins must pair within their cluster"
    for r in out:
        # cluster scoping: both members share the dominant axis = cell
        assert int(r["id1"]) % 2 == int(r["id2"]) % 2 == r["cell"]
        assert r["cosine"] >= 0.99

    # auto k-means path finds the same duplicate structure
    auto = semantic_dedup_pairs(
        df, threshold=0.99, n_centroids=2, sample_size=40, seed=1
    ).collect()
    assert {(r["id1"], r["id2"]) for r in auto} == {
        (r["id1"], r["id2"]) for r in out
    }


def test_broadcast_verify_auto_resolution(spark, docs):
    from pydi_spark.llmdata.dedup import _resolve_broadcast_verify

    # explicit booleans pass through untouched
    assert _resolve_broadcast_verify(docs, True) is True
    assert _resolve_broadcast_verify(docs, False) is False
    # createDataFrame-backed frames have no reliable Catalyst size
    # estimate (LogicalRDD defaults to "unknown" = huge) -> auto must be
    # conservative and NOT broadcast
    assert _resolve_broadcast_verify(docs, "auto") is False
    # parquet-backed frames have file-size stats: small file -> broadcast,
    # 0-byte ceiling -> never
    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _resolve_broadcast_verify(pq, "auto") is True
    assert _resolve_broadcast_verify(pq, "auto", max_bytes=0) is False


def test_minhash_same_result_without_broadcast(docs):
    kw = dict(num_hashes=16, bands=4, jaccard_threshold=0.9)
    pinned = {(r["id1"], r["id2"]) for r in
              minhash_near_duplicates(docs, broadcast_verify=True, **kw).collect()}
    shuffled = {(r["id1"], r["id2"]) for r in
                minhash_near_duplicates(docs, broadcast_verify=False, **kw).collect()}
    assert pinned == shuffled and pinned


def test_png_codec_roundtrip():
    from pydi_spark.llmdata.multimodal import png_decoder, png_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    decoded = png_decoder(png_encode(img))
    assert decoded.shape == (11, 7, 3)
    assert np.array_equal((decoded * 255.0 + 0.5).astype(np.uint8), img)


def test_png_decoder_all_filters():
    # exercise Sub/Up/Average/Paeth unfiltering by writing each filter
    # type by hand on a gradient (encoder alone always emits filter 0)
    import struct
    import zlib

    from pydi_spark.llmdata.multimodal import png_decoder

    h, w = 5, 4
    img = (np.arange(h * w * 3, dtype=np.uint32) * 7 % 256).astype(np.uint8).reshape(h, w, 3)
    stride = w * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1}.get(ftype)
            if pred is None:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    decoded = png_decoder(payload)
    assert np.array_equal((decoded * 255.0 + 0.5).astype(np.uint8), img)


def test_decode_and_resize_real_png(spark):
    from pydi_spark.llmdata.multimodal import decode_and_resize, png_encode

    rng = np.random.default_rng(3)
    rows = [
        (f"m{i}", bytearray(png_encode(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))))
        for i in range(3)
    ] + [("bad", bytearray(b"not a png at all"))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in decode_and_resize(df, 8, 8).collect()}
    assert out["m0"]["decode_ok"] == "ok" and len(out["m0"]["pixels"]) == 8 * 8 * 3
    assert all(0.0 <= p <= 1.0 for p in out["m1"]["pixels"])
    assert out["bad"]["decode_ok"].startswith("error")


def test_wav_codec_roundtrip_and_features(spark):
    from pydi_spark.llmdata.multimodal import (
        extract_audio_features,
        wav_decoder,
        wav_encode,
    )

    t = np.linspace(0, 1, 1600, endpoint=False)
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    decoded = wav_decoder(wav_encode(sine))
    assert decoded.shape == (1600,)
    assert np.max(np.abs(decoded - sine)) < 1e-3  # 16-bit quantization

    rows = [("a", bytearray(wav_encode(sine))),
            ("silent", bytearray(wav_encode(np.zeros(100)))),
            ("bad", bytearray(b"RIFFgarbage"))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert out["a"]["decode_ok"] == "ok" and out["a"]["n_samples"] == 1600
    assert abs(out["a"]["rms"] - 0.3536) < 0.01  # 0.5/sqrt(2)
    assert out["a"]["zero_crossing_rate"] > 0.2  # 440 Hz at 1600 samples/s
    assert out["silent"]["rms"] == 0.0
    assert out["bad"]["decode_ok"].startswith("error")


def test_ngram_prefix_filter_is_exact(docs):
    kw = dict(shingle_size=3, jaccard_threshold=0.5)
    full = {(r["id1"], r["id2"]) for r in
            ngram_jaccard_duplicates(docs, prefix_filter=False, **kw).collect()}
    pref = {(r["id1"], r["id2"]) for r in
            ngram_jaccard_duplicates(docs, prefix_filter=True, **kw).collect()}
    assert full == pref  # PPJoin prefix principle: candidates shrink, result doesn't


def test_jpeg_codec_roundtrip():
    from pydi_spark.llmdata.jpeg import jpeg_decoder, jpeg_encode

    h, w = 24, 40  # non-multiple-of-8 width path (edge replication)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (h + w)], axis=-1
    ).astype(np.uint8)
    payload = jpeg_encode(img, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    out = jpeg_decoder(payload)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 32  # lossy but close on gradients

    with pytest.raises(ValueError):
        jpeg_decoder(b"\x89PNG not a jpeg")


def test_decode_and_resize_real_jpeg(spark):
    from pydi_spark.llmdata.jpeg import jpeg_encode
    from pydi_spark.llmdata.multimodal import decode_and_resize

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([xx * 15, yy * 15, xx * 0], axis=-1).astype(np.uint8)
    rows = [("j0", bytearray(jpeg_encode(img)))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in decode_and_resize(df, 8, 8).collect()}
    assert out["j0"]["decode_ok"] == "ok" and len(out["j0"]["pixels"]) == 8 * 8 * 3


def test_clean_document_lines(spark):
    from pydi_spark.llmdata.cleaning import clean_document_lines

    rows = [
        ("d1", "a good long line here\nok\nshare this\nanother decent line"),
        ("d2", "share this\nsolid line of text"),
        ("d3", "share this\ntiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in clean_document_lines(
            df, min_words=2, max_line_doc_frequency=2
        ).collect()
    }
    # 'share this' passes min_words but occurs in 3 > 2 docs -> global drop
    assert out["d1"]["clean_text"] == "a good long line here\nanother decent line"
    assert out["d1"]["n_lines_kept"] == 2 and out["d1"]["n_lines_total"] == 4
    assert out["d2"]["clean_text"] == "solid line of text"
    assert out["d3"]["clean_text"] == ""  # 'tiny' fails min_words
    assert out["d3"]["n_lines_kept"] == 0 and out["d3"]["n_lines_total"] == 2

    # terminal punctuation rule
    df2 = spark.createDataFrame(
        [("x", "a proper sentence.\nno punct here")], "doc_id string, text string"
    )
    got = clean_document_lines(df2, require_terminal_punct=True).collect()[0]
    assert got["clean_text"] == "a proper sentence."


def test_dedup_corpus_lines(spark):
    from pydi_spark.llmdata.cleaning import dedup_corpus_lines

    rows = [
        ("d1", "unique one\nshared footer\n\nunique two"),
        ("d2", "shared footer\nunique three\n"),
        ("d3", "shared footer\nshared footer\nunique four"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in dedup_corpus_lines(df).collect()}
    # first occurrence (d1, pos 1) keeps 'shared footer'; later ones drop —
    # including the within-document repeat in d3
    assert out["d1"]["clean_text"] == "unique one\nshared footer\n\nunique two"
    assert out["d1"]["n_lines_kept"] == 4 and out["d1"]["n_lines_total"] == 4
    assert out["d2"]["clean_text"] == "unique three\n"  # empty line kept
    assert out["d2"]["n_lines_kept"] == 2
    assert out["d3"]["clean_text"] == "unique four"
    assert out["d3"]["n_lines_kept"] == 1 and out["d3"]["n_lines_total"] == 3

    # partition-count independence of the 'first occurrence' choice
    single = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_corpus_lines(df.coalesce(1)).collect()
    }
    assert single == {k: v["clean_text"] for k, v in out.items()}


def test_repetition_scores(spark):
    from pydi_spark.llmdata.textstats import repetition_scores

    rows = [
        ("r1", "a a a a"),               # one word repeated
        ("r2", "w x y z"),               # all distinct
        ("r3", "p q p q p q"),           # bigrams 'p q' x3, 'q p' x2
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert out["r1"]["top_word_frac"] == 1.0
    assert out["r1"]["dup_2gram_frac"] == pytest.approx(1 - 1 / 3)
    assert out["r2"]["top_word_frac"] == 0.25
    assert out["r2"]["dup_2gram_frac"] == 0.0
    assert out["r2"]["distinct_word_ratio"] == 1.0
    assert out["r3"]["distinct_word_ratio"] == pytest.approx(2 / 6)
    assert out["r3"]["dup_2gram_frac"] == pytest.approx(1 - 2 / 5)


def test_redact_pii(spark):
    from pydi_spark.llmdata.textstats import redact_pii

    rows = [("p1", "mail a.b+c@test.org call 555-123-4567 ip 10.0.0.255 done"),
            ("p2", "nothing sensitive here")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out["p1"]["redacted_text"] == "mail <EMAIL> call <PHONE> ip <IP> done"
    assert (out["p1"]["n_emails"], out["p1"]["n_phones"], out["p1"]["n_ips"]) == (1, 1, 1)
    assert out["p2"]["redacted_text"] == "nothing sensitive here"
    assert out["p2"]["n_emails"] == 0


def test_embedding_quantize_and_pool(spark):
    from pydi_spark.llmdata.embeddings import l2_normalize, mean_pool, quantize_int8

    rows = [("a", [3.0, 4.0], "g1"), ("b", [0.0, 0.0], "g1"), ("c", [1.0, 1.0], "g2")]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>, label string")

    norm = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert norm["a"]["normalized"] == pytest.approx([0.6, 0.8])
    assert norm["a"]["l2_norm"] == pytest.approx(5.0)
    assert norm["b"]["normalized"] == [0.0, 0.0]  # zero vector passes through

    q = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert q["a"]["qvec"] == [95, 127]  # 0.6/0.8 * (127/0.8)
    assert q["b"]["qvec"] == [0, 0] and q["b"]["scale"] == 0.0
    assert max(abs(v) for v in q["c"]["qvec"]) == 127

    pooled = {r["group"]: r for r in mean_pool(df, "label").collect()}
    assert pooled["g1"]["pooled"] == pytest.approx([1.5, 2.0])
    assert pooled["g1"]["n_vectors"] == 2
    assert pooled["g2"]["pooled"] == pytest.approx([1.0, 1.0])


def test_dedup_corpus_lines_idempotent(spark):
    from pydi_spark.llmdata.cleaning import dedup_corpus_lines

    rows = [
        ("a", "x one\nshared\nx two"),
        ("b", "shared\ny one\nshared"),
        ("c", "z one\nshared\nz one"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    once = dedup_corpus_lines(df)
    twice = dedup_corpus_lines(
        once.select("doc_id", F.col("clean_text").alias("text"))
    )
    a = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    b = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
    # a clean corpus has no repeated lines left -> dedup is idempotent
    # (up to the blank placeholders of already-removed lines)
    for k in a:
        assert [x for x in b[k].split("\n") if x.strip()] == [
            x for x in a[k].split("\n") if x.strip()
        ]


def test_semantic_dedup_subset_of_bruteforce(spark):
    import numpy as np

    from pydi_spark.llmdata.dedup import (
        embedding_near_duplicates,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(6)]) for i in range(60)
    ]
    # plant twins
    rows += [(100 + i, [v * 1.001 for v in rows[i][1]]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = [[float(x) for x in c] for c in rng.standard_normal((4, 6))]
    sem = {
        (r["id1"], r["id2"])
        for r in semantic_dedup_pairs(df, threshold=0.9, centroids=cents).collect()
    }
    brute = {
        (r["id1"], r["id2"])
        for r in embedding_near_duplicates(
            df, threshold=0.9, method="brute"
        ).collect()
    }
    # normalize orientation: pair operators orient by STRING id order
    norm = lambda s: {tuple(sorted(p)) for p in s}  # noqa: E731
    sem, brute = norm(sem), norm(brute)
    # cluster scoping can only REMOVE cross-cluster pairs, never invent
    assert sem <= brute
    # near-identical twins land in the same cluster -> all recovered
    twins = norm({(str(i), str(100 + i)) for i in range(5)})
    assert twins <= sem


def test_unigram_lm_scores(spark):
    import math

    from pydi_spark.llmdata.textstats import unigram_lm_scores

    rows = [
        ("d1", "the cat sat on the mat"),
        ("d2", "the the the the"),
        ("d3", "zygote qux flux"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}

    # self-trained: no OOV, counts replayed by hand
    # corpus tokens: the x6, cat,sat,on,mat,zygote,qux,flux x1 -> N=13
    assert all(r["n_oov"] == 0 for r in out.values())
    assert out["d2"]["n_tokens"] == 4 and out["d2"]["sum_count"] == 24
    assert abs(out["d2"]["mean_token_freq"] - (24 / 4) / 13) < 1e-15
    # "all common words" scores above "all rare words"
    assert out["d2"]["mean_logprob"] > out["d3"]["mean_logprob"]

    # numpy replay of the smoothed logprob (alpha=1, N=13, V=8)
    lp = math.log((6 + 1) / (13 + 8))  # P('the')
    assert abs(out["d2"]["mean_logprob"] - lp) < 1e-12

    # external training corpus: unseen tokens count as OOV but still
    # get smoothed mass
    train = spark.createDataFrame(
        [("t1", "the cat sat")], "doc_id string, text string"
    )
    ext = {
        r["doc_id"]: r
        for r in unigram_lm_scores(df, train_df=train).collect()
    }
    assert ext["d3"]["n_oov"] == 3 and ext["d3"]["sum_count"] == 0
    assert math.isfinite(ext["d3"]["mean_logprob"])


def test_quality_weighted_sample(spark):
    from pydi_spark.llmdata.sampling import quality_weighted_sample

    rows = [(f"d{i}", (i % 11) / 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    out = quality_weighted_sample(df, "w", "doc_id").collect()
    for r in out:
        assert r["weight_ppm"] == int(1e6 * min(1.0, max(0.0, r["w"])))
        assert abs(r["rate"] - r["weight_ppm"] / 1e6) < 1e-12
    # zero-weight rows can never be selected
    assert not any(r["selected"] for r in out if r["weight_ppm"] == 0)

    scaled = quality_weighted_sample(
        df, "w", "doc_id", target_fraction=0.5
    ).collect()
    n = len(scaled)
    exp = sum(r["rate"] for r in scaled)
    assert abs(exp - 0.5 * n) / n < 0.25  # rates target the fraction
    # decision is keyed to the row: repartitioned input selects same rows
    again = quality_weighted_sample(
        df.repartition(7), "w", "doc_id", target_fraction=0.5
    ).collect()
    assert {r["doc_id"] for r in scaled if r["selected"]} == {
        r["doc_id"] for r in again if r["selected"]
    }


def test_deterministic_sample(spark):
    from pydi_spark.llmdata.sampling import deterministic_sample

    df = spark.createDataFrame(
        [(i, "hot" if i % 4 == 0 else "cold") for i in range(2000)],
        "k long, stratum string",
    ).withColumn("rid", F.col("k").cast("string"))

    s1 = {r["k"] for r in deterministic_sample(df, 0.2, "rid").collect()}
    # partitioning must not change the selection
    s2 = {r["k"] for r in
          deterministic_sample(df.repartition(13), 0.2, "rid").collect()}
    assert s1 == s2
    assert 0.1 < len(s1) / 2000 < 0.3  # roughly the rate

    strat = deterministic_sample(
        df, 0.05, "rid", stratum_col="stratum", rates={"hot": 0.9}
    ).groupBy("stratum").count().collect()
    by = {r["stratum"]: r["count"] for r in strat}
    assert by["hot"] / 500 > 0.7 and by.get("cold", 0) / 1500 < 0.15


def test_decontaminate(spark):
    from pydi_spark.llmdata.cleaning import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with distinct words only"),
            (3, "tiny doc"),  # shorter than n -> whole-seq gram
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps over"), (101, "tiny doc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decontaminate(train, ev, n=3, threshold=0.3).collect()}
    # doc 1: 8 distinct trigrams, 3 of them in eval ("quick brown fox",
    # "brown fox jumps", "fox jumps over")
    assert out["1"]["n_ngrams"] == 8 and out["1"]["n_overlap"] == 3
    assert out["1"]["is_contaminated"]  # 3/8 >= 0.3
    assert out["2"]["n_overlap"] == 0 and not out["2"]["is_contaminated"]
    # short doc matches the eval short doc exactly via the whole-seq rule
    assert out["3"]["n_ngrams"] == 1 and out["3"]["n_overlap"] == 1


def test_canonical_corpus(spark):
    from pydi_spark.llmdata.dedup import canonical_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters: {1,2,3} (chain), {5,7}; 4 and 6 unpaired
    pairs = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("5", "7")], "id1 string, id2 string"
    )
    out = {r["doc_id"]: r for r in canonical_corpus(docs, pairs).collect()}
    assert len(out) == 7  # corpus multiplicity preserved
    assert [out[i]["canonical_id"] for i in range(1, 8)] == \
        ["1", "1", "1", "4", "5", "6", "5"]
    kept = {i for i in out if out[i]["is_canonical"]}
    assert kept == {1, 4, 5, 6}


def test_quality_filter(spark):
    from pydi_spark.llmdata import quality_filter

    prose = ("the quick brown fox and a lazy dog walk to the old town "
             "in heavy rain while seven children watch from a wooden bridge "
             "near the river bend and wave at every passing boat until dusk")
    docs = spark.createDataFrame(
        [
            (1, prose),                      # passes everything
            (2, "short doc"),                # fails min_tokens
            (3, "spam " * 60),               # fails top-word + dup-2gram
            (4, " ".join(str(i) for i in range(9000, 9060))),  # digits
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_filter(docs, min_tokens=30).collect()}
    assert out["1"]["keep"]
    assert not out["2"]["ok_length"] and not out["2"]["keep"]
    assert not out["3"]["ok_top_word"] and not out["3"]["ok_dup_2gram"]
    assert not out["4"]["ok_digits"] and not out["4"]["ok_stopwords"]


def test_vocabulary_and_tfidf(spark):
    from pydi_spark.llmdata import tfidf_keywords, vocabulary

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry date"),
            (3, "apple elderberry"),
        ],
        "doc_id long, text string",
    )
    v = {r["token"]: (r["doc_freq"], r["n_occurrences"])
         for r in vocabulary(docs).collect()}
    assert v["apple"] == (2, 3) and v["cherry"] == (2, 3)
    assert v["elderberry"] == (1, 1)
    assert "apple" not in {
        r["token"] for r in vocabulary(docs, min_doc_freq=3).collect()
    }

    kw = {(r["doc_id"], r["rank"]): r["token"]
          for r in tfidf_keywords(docs, k=1).collect()}
    # doc 3's rarest-and-frequent token is elderberry (df=1)
    assert kw[("3", 1)] == "elderberry"
    # doc 2: cherry (tf 2/4, idf 3/2) ties date (tf 1/4, idf 3) at
    # 0.75 exactly; the token-asc tie-break picks cherry deterministically
    assert kw[("2", 1)] == "cherry"


def test_chunk_documents(spark):
    from pydi_spark.llmdata import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 250), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_chars=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 0, 80, 160, 240 (step 80); last chunk is the tail
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["chunk_start"] for r in c1] == [0, 80, 160, 240]
    assert all(r["n_chunks"] == 4 for r in c1)
    assert len(c1[0]["chunk_text"]) == 100 and len(c1[-1]["chunk_text"]) == 10
    # overlap: consecutive chunks share 20 chars of the original
    assert c1[0]["chunk_text"][80:] == c1[1]["chunk_text"][:20]
    # short and empty docs still produce exactly one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "xy"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == ""

    with __import__("pytest").raises(ValueError):
        chunk_documents(docs, chunk_chars=10, overlap=10)


def test_select_token_budget(spark):
    from pydi_spark.llmdata import select_token_budget

    docs = spark.createDataFrame(
        [(i, "w " * 10, "a") for i in range(10)]
        + [(100, "w " * 3, "b")],
        "doc_id long, text string, source string",
    )
    out = select_token_budget(docs, budget_tokens=35).collect()
    a = sorted((r for r in out if r["source"] == "a"), key=lambda r: r["cum_tokens"])
    # each doc is 10 tokens; budget 35 -> exactly the first 3 in hash order
    assert [r["selected"] for r in a] == [True] * 3 + [False] * 7
    assert a[2]["cum_tokens"] == 30 and a[3]["cum_tokens"] == 40
    # budgets are per source: the lone 3-token 'b' doc fits independently
    b = [r for r in out if r["source"] == "b"]
    assert b[0]["selected"] and b[0]["cum_tokens"] == 3
    # determinism: same selection on a repartitioned input
    again = select_token_budget(docs.repartition(7), budget_tokens=35).collect()
    assert {(r["doc_id"], r["selected"]) for r in again} == {
        (r["doc_id"], r["selected"]) for r in out
    }


def test_bm25_and_inverted_index(spark):
    from pydi_spark.llmdata import bm25_scores, inverted_index

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark join window merge"),
            (3, "window merge sort order"),
            (4, "join"),
        ],
        "doc_id long, text string",
    )
    idx = {r["token"]: r for r in inverted_index(docs).collect()}
    assert idx["spark"]["doc_freq"] == 2 and idx["spark"]["total_tf"] == 4
    assert idx["spark"]["postings"] == "1:3,2:1"
    assert idx["join"]["postings"] == "1:1,2:1,4:1"
    # truncation caps the list but doc_freq still reports the full count
    trunc = {r["token"]: r for r in inverted_index(docs, max_postings=2).collect()}
    assert trunc["join"]["postings"] == "1:1,2:1" and trunc["join"]["doc_freq"] == 3

    hits = bm25_scores(docs, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in hits] == [1, 2]  # tf saturation: doc1 first
    assert [r["rank"] for r in hits] == [1, 2]
    assert all(r["score"] > 0 for r in hits)
    # multi-term: doc 3 only matches 'window', still retrieved
    got = {r["doc_id"] for r in bm25_scores(docs, ["spark", "window"], k=10).collect()}
    assert got == {1, 2, 3}


def test_exact_span_stats(spark):
    from pydi_spark.llmdata import exact_span_stats

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta"),
            (2, shared + " gamma delta"),
            (3, "unrelated words entirely here now"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           exact_span_stats(docs, span_tokens=5, min_docs=2).collect()}
    # docs 1+2 share the 5-token prefix span; docs 3+4 share nothing
    assert out[1]["n_spans"] == 3 and out[1]["n_repeated_spans"] == 1
    assert out[1]["n_covered_tokens"] == 5
    assert abs(out[1]["coverage_ratio"] - 5 / 7) < 1e-12
    assert out[3]["n_repeated_spans"] == 0 and out[3]["coverage_ratio"] == 0.0
    # shorter than one span: no spans at all
    assert out[4]["n_spans"] == 0 and out[4]["n_tokens"] == 1


def test_pack_sequences(spark):
    from pydi_spark.llmdata import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "w " * 100, "a"),   # 100 tokens
            (2, "w " * 100, "a"),   # fits with doc 1 (200 <= 256)
            (3, "w " * 100, "a"),   # overflows -> bin 1
            (4, "w " * 300, "a"),   # longer than capacity -> own bin 2
            (5, "w " * 10, "a"),    # bin 3 (doc 4's bin is overfull)
            (6, "w " * 50, "b"),    # separate source restarts at bin 0
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, 256).collect()}
    assert [out[i]["bin_id"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 3]
    assert out[2]["bin_fill"] == 200 and out[4]["bin_fill"] == 300
    assert out[6]["bin_id"] == 0 and out[6]["source"] == "b"
    # repartitioned input packs identically (order comes from the sort,
    # not from arrival order)
    again = {r["doc_id"]: r["bin_id"]
             for r in pack_sequences(docs.repartition(5), 256).collect()}
    assert again == {k: v["bin_id"] for k, v in out.items()}


def test_pack_sequences_sharded_equivalence(spark):
    """Shard-boundary contract: with n_shards=K the result is EXACTLY
    independent greedy packing of each hash-shard's own doc-id-ordered
    subsequence — i.e. pack(shard_subset) == sharded rows of pack()."""
    from pydi_spark.llmdata import pack_sequences
    from pydi_spark.llmdata.sampling import hash_fraction
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "w " * (7 * (i % 13) + 1), "s" + str(i % 2)) for i in range(80)],
        "doc_id long, text string, source string",
    )
    k = 3
    sharded = pack_sequences(docs, 64, n_shards=k)
    rows = sharded.collect()
    assert {r["shard_id"] for r in rows} <= set(range(k))
    # every doc survives, exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(80))
    # replay: per (shard) subset through the UNsharded path
    with_shard = docs.withColumn(
        "shard_id", F.floor(hash_fraction(F.col("doc_id")) * k).cast("int")
    )
    got = {(r["doc_id"]): (r["shard_id"], r["bin_id"], r["bin_fill"]) for r in rows}
    for s in range(k):
        subset = with_shard.where(F.col("shard_id") == s).drop("shard_id")
        if subset.limit(1).count() == 0:
            continue
        for r in pack_sequences(subset, 64).collect():
            assert got[r["doc_id"]] == (s, r["bin_id"], r["bin_fill"])
    # determinism across physical partitionings
    again = {r["doc_id"]: (r["shard_id"], r["bin_id"])
             for r in pack_sequences(docs.repartition(7), 64, n_shards=k).collect()}
    assert again == {d: (v[0], v[1]) for d, v in got.items()}


def test_perceptual_hash_near_dups(spark):
    import numpy as np

    from pydi_spark.llmdata.multimodal import (
        image_near_duplicates,
        perceptual_hash,
        png_encode,
    )

    rng = np.random.default_rng(7)
    base = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # tiny perturbation -> tiny hamming
    far = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    rows = [
        ("a", bytearray(png_encode(base))),
        ("b", bytearray(png_encode(near))),
        ("c", bytearray(png_encode(far))),
        ("bad", bytearray(b"not a png")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")

    ph = {r["media_id"]: r for r in perceptual_hash(df).collect()}
    assert ph["a"]["decode_ok"] == "ok" and ph["bad"]["decode_ok"].startswith("error")
    assert ph["a"]["phash"] == ph["b"]["phash"] or bin(
        ph["a"]["phash"] ^ ph["b"]["phash"]
    ).count("1") <= 6
    # deterministic: same payload -> same hash on re-run
    assert ph["a"]["phash"] == perceptual_hash(df).where(
        "media_id = 'a'"
    ).first()["phash"]

    pairs = {(r["id1"], r["id2"]): r["hamming"]
             for r in image_near_duplicates(df, max_hamming=6).collect()}
    assert ("a", "b") in pairs
    assert all("c" not in p and "bad" not in p for p in pairs)

    with __import__("pytest").raises(ValueError):
        image_near_duplicates(df, max_hamming=8)


def test_multimodal_phash_frozen_constants(spark):
    """The multimodal_phash oracle replays frozen dHash constants as a
    literal table (VERDICT r9 #5) — pin the SAME constants here so a
    codec/resample/bit-packing change breaks pytest BEFORE the driver
    window goes red. Also pins the invariance the constants encode:
    2x-nearest upscale and JPEG re-encode hash IDENTICALLY to the
    source image; the checkerboard differs; the corrupt payload
    isolates per-record."""
    import __spark_entry__ as entry

    got = {
        r["media_id"]: (r["phash"], r["decode_ok"])
        for r in entry.q_multimodal_phash(spark, "unused").collect()
    }
    assert got == {
        "img_png_gradient": (-1103840346886, "ok"),
        "img_png_checker": (2459565764387545634, "ok"),
        "img_png_upscaled": (-1103840346886, "ok"),
        "img_jpeg_gradient": (-1103840346886, "ok"),
        "img_corrupt": (0, "error: ValueError"),
    }


def test_auto_n_centroids_scales_with_corpus():
    from pydi_spark.llmdata import auto_n_centroids

    assert auto_n_centroids(100) == 16          # floor
    assert auto_n_centroids(1_000_000) == 1000  # ~sqrt(n) above the cutoff
    assert auto_n_centroids(10**9) == 4096      # cap


def test_minhash_hashed_verify_equals_string_jaccard(spark):
    """The 60-bit hashed-token verification must produce the SAME
    jaccard values as true string token sets (collisions are ~2^-60 per
    pair; this pins the semantics against accidental lossy changes)."""
    import re

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog today"),
        (4, "completely unrelated text about spark and arrow batches"),
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    from pydi_spark.llmdata import minhash_near_duplicates

    out = minhash_near_duplicates(df, jaccard_threshold=0.1).collect()
    assert out, "fixture overlaps should produce pairs"
    tok = {str(i): set(re.findall(r"[^\W_]+(?:'[^\W_]+)*|[#']+", t.lower()))
           for i, t in docs}

    def true_jac(a, b):
        sa, sb = tok[a], tok[b]
        return len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0

    for r in out:
        expected = true_jac(r["id1"], r["id2"])
        assert abs(r["jaccard"] - expected) < 1e-12, (
            r["id1"], r["id2"], r["jaccard"], expected
        )


def test_temperature_mix_balances_sources(spark):
    from pydi_spark.llmdata import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, target_fraction=0.3, alpha=0.5)
    rates = {r["source"]: r["rate"]
             for r in out.select("source", "rate").distinct().collect()}
    # alpha < 1 up-weights the small source relative to proportional
    assert rates["small"] > rates["big"]
    # expected kept total is target_fraction * N
    assert abs(rates["big"] * 900 + rates["small"] * 100 - 300) < 1e-6
    # alpha = 1 degenerates to proportional sampling: uniform rate
    out1 = temperature_mix(df, target_fraction=0.3, alpha=1.0)
    r1 = [r["rate"] for r in out1.select("rate").distinct().collect()]
    assert all(abs(x - 0.3) < 1e-9 for x in r1)
    # determinism: same rows selected on a repartitioned input
    sel_a = {r["doc_id"] for r in out.where("selected").collect()}
    sel_b = {r["doc_id"] for r in
             temperature_mix(df.repartition(7), 0.3, alpha=0.5)
             .where("selected").collect()}
    assert sel_a == sel_b


def test_zipf_table(spark):
    from pydi_spark.llmdata import zipf_table

    rows = [(1, "a a a b b c"), (2, "a b d"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_table(df, top=10).collect()
    by_tok = {r["token"]: r for r in out}
    assert by_tok["a"]["count"] == 5 and by_tok["a"]["rank"] == 1
    assert by_tok["b"]["count"] == 3 and by_tok["b"]["rank"] == 2
    # c/d tie on count=1 -> token order breaks the tie
    assert by_tok["c"]["rank"] == 3 and by_tok["d"]["rank"] == 4
    assert by_tok["d"]["cum_count"] == 10
    assert abs(by_tok["d"]["cum_share"] - 1.0) < 1e-12
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4]


def test_cross_source_overlap(spark):
    from pydi_spark.llmdata import cross_source_overlap

    rows = [
        (1, "alpha beta gamma delta", "s1"),
        (2, "alpha beta epsilon zeta", "s2"),
        (3, "nothing shared here at all", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_overlap(df, n=2).collect()
    }
    # s1/s2 share exactly the bigram "alpha beta"
    r12 = out[("s1", "s2")]
    assert r12["n_shared"] == 1 and r12["n_a"] == 3 and r12["n_b"] == 3
    assert abs(r12["jaccard"] - 1.0 / 5.0) < 1e-12
    # disjoint sources produce no row at all
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_dsir_scores(spark):
    from pydi_spark.llmdata import dsir_scores

    rows = [
        (1, "spark spark spark", "en"),    # target
        (2, "spark query engine", "en"),   # target
        (3, "spark spark query", "xx"),    # source, target-like
        (4, "haus hund katze", "xx"),      # source, not target-like
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in dsir_scores(df, F.col("lang") == "en").collect()}
    # only source docs are scored
    assert set(out) == {"3", "4"}
    # doc 3 shares the target's vocabulary -> strictly higher ratio
    assert out["3"]["ratio_micro"] > out["4"]["ratio_micro"]
    # doc 4's tokens never occur in the target -> target_mass == 0
    assert out["4"]["target_mass"] == 0 and out["4"]["ratio_micro"] == 0
    assert out["3"]["n_tokens"] == 3


def test_pq_encode_and_adc(spark):
    from pydi_spark.llmdata import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(40, 16).astype(np.float64)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = train_pq_codebooks(
        df, n_subspaces=4, n_centroids=8, sample_size=40, n_iter=5
    )
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == 4
    codes = pq_encode(df, cbs)
    assert codes.count() == 160  # 40 vectors x 4 subspaces
    pdf = codes.toPandas()
    assert set(pdf["subspace"]) == {0, 1, 2, 3}
    assert pdf["code"].between(0, 7).all()

    # ADC distance must approximate the true L2: the ADC-nearest
    # neighbour of a query inside the dataset should rank the query's
    # true nearest within the top-5 (tight data, trained codebooks)
    q = base[7]
    top = pq_adc_topk(codes, cbs, [float(x) for x in q], k=5).collect()
    assert top[0]["rank"] == 1
    ids = [r["id"] for r in top]
    assert 7 in ids  # the vector itself quantizes closest
    # exact integer determinism: re-running yields identical rows
    top2 = pq_adc_topk(codes, cbs, [float(x) for x in q], k=5).collect()
    assert [(r["id"], r["adc_micro"]) for r in top] == [
        (r["id"], r["adc_micro"]) for r in top2
    ]


def test_ivfpq_topk_trained(spark):
    from pydi_spark.llmdata import ivfpq_topk, train_pq_codebooks
    from pydi_spark.llmdata.similarity import _kmeans_centroids

    rng = np.random.RandomState(9)
    # three well-separated clusters so the coarse quantizer is meaningful
    centers = rng.randn(3, 16) * 4
    base = np.vstack([centers[i % 3] + rng.randn(16) * 0.3 for i in range(60)])
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    coarse = _kmeans_centroids(df, "embedding", 3, sample_size=60, seed=3)
    coarse = [[float(x) for x in c] for c in coarse]
    cbs = train_pq_codebooks(df, n_subspaces=4, n_centroids=8,
                             sample_size=60, n_iter=5)
    q = base[11]
    top = ivfpq_topk(df, coarse, cbs, [float(x) for x in q],
                     k=5, nprobe=1).collect()
    assert len(top) == 5 and top[0]["rank"] == 1
    # nprobe=1 restricts to one cell
    assert len({r["cell"] for r in top}) == 1
    # the query vector itself must surface in its own probed cell's top-5
    assert 11 in [r["id"] for r in top]
    # ADC distances are non-decreasing with rank
    adcs = [r["adc_micro"] for r in sorted(top, key=lambda r: r["rank"])]
    assert adcs == sorted(adcs)


def test_new_ops_partition_independent(spark):
    """dsir_scores / cross_source_overlap / pq_encode must yield
    identical rows regardless of input partitioning (the determinism
    contract every sampler/dedup op in the engine carries)."""
    from pydi_spark.llmdata import cross_source_overlap, dsir_scores, pq_encode

    rng = np.random.RandomState(21)
    rows = [
        (i, " ".join(rng.choice(list("abcdefgh"), 6)), ["en", "xx"][i % 2],
         f"s{i % 3}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    for frame in (df.coalesce(1), df.repartition(7, "source")):
        a = sorted(map(tuple, dsir_scores(df, F.col("lang") == "en").collect()))
        b = sorted(map(tuple, dsir_scores(frame, F.col("lang") == "en").collect()))
        assert a == b
        oa = sorted(map(tuple, cross_source_overlap(df).collect()))
        ob = sorted(map(tuple, cross_source_overlap(frame).collect()))
        assert oa == ob

    emb_rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(20)]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    cbs = [[[float(x) for x in rng.randn(4)] for _ in range(4)] for _ in range(4)]
    ca = sorted(map(tuple, pq_encode(emb, cbs).collect()))
    cb2 = sorted(map(tuple, pq_encode(emb.repartition(5), cbs).collect()))
    assert ca == cb2


def test_quality_classifier_train_and_score(spark):
    from pydi_spark.llmdata import (
        linear_quality_classifier,
        train_quality_classifier,
    )

    pos_rows = [(i, "spark query engine join " * 3) for i in range(20)]
    neg_rows = [(100 + i, "lorem ipsum dolor sit amet " * 3) for i in range(20)]
    pos = spark.createDataFrame(pos_rows, "doc_id long, text string")
    neg = spark.createDataFrame(neg_rows, "doc_id long, text string")
    w, b = train_quality_classifier(pos, neg, n_buckets=64, sample_size=40)
    assert len(w) == 64 and isinstance(b, int)

    both = pos.unionByName(neg)
    out = {r["doc_id"]: r for r in
           linear_quality_classifier(both, w, bias_micro=b).collect()}
    # trained weights separate the two vocabularies
    assert all(out[str(i)]["keep"] == 1 for i in range(20))
    assert all(out[str(100 + i)]["keep"] == 0 for i in range(20))
    # margin is an exact integer, reproducible under repartition
    out2 = {r["doc_id"]: r["margin_micro"] for r in
            linear_quality_classifier(both.repartition(7), w,
                                      bias_micro=b).collect()}
    assert {k: v["margin_micro"] for k, v in out.items()} == out2


# -- BPE subword training / segmentation (llmdata/bpe.py) --------------


def _bpe_reference_train(word_freqs, n_merges, min_freq=2):
    """Pure-Python mirror of train_bpe_merges: overlapping adjacent-pair
    counts, argmax under (cnt desc, a, b), double-space boundary replace
    apply (canonical leftmost-greedy)."""
    words = {w: ["  " + "  ".join(w) + "  ", f] for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for sym, f in words.values():
            parts = sym.split()
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((a, b))
        for w, (sym, f) in words.items():
            words[w] = [sym.replace(f" {a}  {b} ", f" {a}{b} "), f]
    return merges


def test_bpe_train_matches_reference(spark):
    from pydi_spark.llmdata import train_bpe_merges

    texts = [
        "the cat sat on the mat",
        "the hat and the cat chat",
        "that mat and that hat",
        "chatter on the matter",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = train_bpe_merges(df, n_merges=8, word_filter=r"^[a-z]+$")
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _bpe_reference_train(freqs, 8)
    assert got == want
    # the top merge really is the most frequent bigram: 'at' dominates
    assert got[0] == ("a", "t")


def test_bpe_greedy_apply_canonical():
    from pydi_spark.llmdata.bpe import greedy_apply

    ranks = {("a", "t"): 0, ("th", "at"): 2, ("t", "h"): 1}
    assert greedy_apply("that", ranks) == ["that"]
    assert greedy_apply("hat", ranks) == ["h", "at"]
    # lower rank wins even when a later pair appears first in the word
    assert greedy_apply("tha", ranks) == ["th", "a"]
    # no applicable merges -> characters
    assert greedy_apply("xyz", ranks) == ["x", "y", "z"]


def test_bpe_replay_handles_boundary_chains(spark):
    from pydi_spark.llmdata import bpe_segment

    # double-space boundaries make one replace pass per merge equal
    # canonical leftmost-greedy merging, even on same-symbol chains
    rows = [("aaaa", 1), ("aaaaaa", 1), ("ababab", 1)]
    df = spark.createDataFrame(rows, "word string, freq long")
    out = {r["word"]: r["pieces"]
           for r in bpe_segment(df, [("a", "a"), ("a", "b")]).collect()}
    assert out["aaaa"] == "aa aa"
    assert out["aaaaaa"] == "aa aa aa"
    assert out["ababab"] == "ab ab ab"


def test_bpe_modes_agree_on_corpus(spark, sf_dir):
    from pydi_spark.llmdata import bpe_segment, piece_stats, word_frequencies

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = word_frequencies(docs, word_filter=r"^[a-z]+$")
    merges = [("e", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("a", "t")]
    a = piece_stats(bpe_segment(wf, merges, mode="merge_replay"), 30)
    b = piece_stats(bpe_segment(wf, merges, mode="greedy"), 30)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_incremental_minhash_dedup_semantics(spark):
    from pydi_spark.llmdata import (
        incremental_minhash_dedup,
        minhash_signature_table,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    store_rows = [(1, base), (2, "completely different vocabulary about spark joins")]
    batch_rows = [
        (10, base),                                    # dup of store doc 1
        (11, "unrelated text mentioning catalyst optimizer rules"),
        (12, "unrelated text mentioning catalyst optimizer rules"),  # dup of 11
        (13, "another singleton about watermark state eviction"),
    ]
    store_docs = spark.createDataFrame(store_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    store = minhash_signature_table(store_docs, num_hashes=8)
    out = {r["id"]: r for r in incremental_minhash_dedup(
        batch, store, num_hashes=8, bands=4, jaccard_threshold=0.7).collect()}
    assert len(out) == 4
    assert out["10"]["matched_store"] == 1 and out["10"]["kept"] == 0
    # in-batch pair 11/12: min string id kept, other assigned to it
    assert out["11"]["kept"] == 1 and out["11"]["canonical_id"] == "11"
    assert out["12"]["kept"] == 0 and out["12"]["canonical_id"] == "11"
    assert out["13"]["kept"] == 1 and out["13"]["matched_store"] == 0
    # partition-independence: same decisions under a different layout
    out2 = {r["id"]: (r["matched_store"], r["canonical_id"], r["kept"])
            for r in incremental_minhash_dedup(
                batch.repartition(7), store.repartition(5),
                num_hashes=8, bands=4, jaccard_threshold=0.7).collect()}
    assert out2 == {k: (v["matched_store"], v["canonical_id"], v["kept"])
                    for k, v in out.items()}


def test_incremental_minhash_dedup_refuses_pre_r11_string_store(spark):
    """A signature store persisted before the r11 Carter-Wegman rewrite
    carries md5-hex STRING lanes: it would band-collide with nothing
    (silent total recall loss against history) and then get bigint rows
    appended into a string-lane parquet directory. Refused loudly."""
    import pytest

    from pydi_spark.llmdata import incremental_minhash_dedup

    old_store = spark.createDataFrame(
        [("1", *["ab" * 16] * 8, [1, 2])],
        "id string, " + ", ".join(f"s{i} string" for i in range(8))
        + ", toks array<bigint>",
    )
    batch = spark.createDataFrame([(10, "some text")], "doc_id long, text string")
    with pytest.raises(TypeError, match="pre-r11"):
        incremental_minhash_dedup(batch, old_store, num_hashes=8, bands=4)


def test_incremental_minhash_dedup_tokenless_docs_survive(spark):
    """Docs whose text tokenizes to zero tokens produce no signature
    row; they must still appear in the output as survivors
    (round-4 ADVICE: they previously vanished from both outputs)."""
    from pydi_spark.llmdata import (
        incremental_minhash_dedup,
        minhash_signature_table,
    )

    store_docs = spark.createDataFrame(
        [(1, "some stored corpus text about rivers")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(20, "some stored corpus text about rivers"),   # store dup
         (21, "!!! ...  "),                              # punctuation only
         (22, ""),                                       # empty
         (23, "a fresh singleton about broadcast joins")],
        "doc_id long, text string")
    store = minhash_signature_table(store_docs, num_hashes=8)
    out = {r["id"]: r for r in incremental_minhash_dedup(
        batch, store, num_hashes=8, bands=4, jaccard_threshold=0.7).collect()}
    assert set(out) == {"20", "21", "22", "23"}
    assert out["20"]["matched_store"] == 1 and out["20"]["kept"] == 0
    for tokenless in ("21", "22"):
        r = out[tokenless]
        assert (r["matched_store"], r["canonical_id"], r["kept"]) == (
            0, tokenless, 1)
    assert out["23"]["kept"] == 1


def test_exact_k_sample_global_and_stratified(spark):
    from pydi_spark.llmdata import exact_k_sample

    rows = [(i, "s" + str(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, s string")
    g = exact_k_sample(df, 10, key_col="k")
    assert g.count() == 10
    assert [r["sample_rank"] for r in g.orderBy("sample_rank").collect()] == list(range(1, 11))
    st = exact_k_sample(df, 5, key_col="k", stratum_col="s")
    per = {r["s"]: r["n"] for r in st.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # partition independence
    a = sorted(map(tuple, st.select("k", "s", "sample_rank").collect()))
    b = sorted(map(tuple, exact_k_sample(df.repartition(13), 5, "k", "s")
                  .select("k", "s", "sample_rank").collect()))
    assert a == b


def test_key_skew_report(spark):
    from pydi_spark.profiling import key_skew_report

    rows = [("hot",)] * 90 + [("warm",)] * 9 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r["key"]: r for r in key_skew_report(df, "k", top_n=2).collect()}
    assert set(out) == {"hot", "warm"}
    assert out["hot"]["cnt"] == 90 and out["hot"]["share_ppm"] == 900000
    assert out["hot"]["rank"] == 1 and out["warm"]["rank"] == 2


def test_rerank_topk_custom_scorer(spark):
    from pydi_spark.llmdata import rerank_topk

    docs = spark.createDataFrame(
        [(1, "spark join engine"), (2, "spark only"), (3, "nothing here")],
        "doc_id long, text string",
    )
    cands = docs.select("doc_id")
    # default overlap scorer
    out = {r["doc_id"]: r for r in
           rerank_topk(cands, docs, ["spark", "join"], k=3).collect()}
    assert out["1"]["score"] == 2.0 and out["1"]["rank"] == 1
    assert out["2"]["score"] == 1.0 and out["3"]["score"] == 0.0
    # injectable scorer seam: score by text length
    def factory():
        return lambda terms, texts: [float(len(t)) for t in texts]
    out2 = rerank_topk(cands, docs, ["x"], scorer_factory=factory, k=1).collect()
    assert out2[0]["doc_id"] == "1" and out2[0]["score"] == len("spark join engine")


def test_dedup_method_agreement(spark):
    from pydi_spark.llmdata import dedup_method_agreement

    near_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    near_b = near_a + " kilo"          # high-jaccard near dup of near_a
    rows = [(1, near_a), (2, near_b), (3, "totally different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_method_agreement(
        df,
        minhash_params=dict(num_hashes=8, bands=4, jaccard_threshold=0.7),
        simhash_params=dict(max_hamming=3, bands=4),
        ngram_params=dict(shingle_size=3, jaccard_threshold=0.5,
                          max_shingle_frequency=None),
    ).collect()
    # every emitted subset is non-empty and involves the (1,2) pair only
    total = sum(r["n_pairs"] for r in out)
    assert total >= 1
    for r in out:
        assert r["minhash"] + r["simhash"] + r["ngram"] >= 1
        assert r["n_pairs"] >= 1


def test_vocab_coverage(spark):
    from pydi_spark.llmdata import vocab_coverage

    rows = [(1, "a b c a", "s1"), (2, "a x y", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["grp"]: r for r in
           vocab_coverage(df, ["a", "b"], group_col="source").collect()}
    assert out["s1"]["n_tokens"] == 4 and out["s1"]["n_in_vocab"] == 3
    assert out["s1"]["n_oov_types"] == 1          # 'c'
    assert out["s1"]["coverage_ppm"] == 750000
    assert out["s2"]["n_in_vocab"] == 1 and out["s2"]["n_oov_types"] == 2
    # corpus-level (no group)
    tot = vocab_coverage(df, ["a", "b"], group_col=None).collect()
    assert len(tot) == 1 and tot[0]["n_tokens"] == 7


def test_pagerank_micro(spark):
    from pydi_spark.llmdata import pagerank_micro

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "id1 string, id2 string",
    )
    out = {r["id"]: r["rank_micro"] for r in pagerank_micro(edges, n_iter=5).collect()}
    # hub c (deg 3) outranks everything; leaf d (deg 1) ranks last
    assert out["c"] == max(out.values()) and out["d"] == min(out.values())
    # conservation (up to the documented floor bias): sum <= n * 1e6
    assert sum(out.values()) <= 4 * 1_000_000
    assert sum(out.values()) > 4 * 1_000_000 - 4 * 5  # bias < 1 micro/term/iter... loose bound
    # partition independence
    out2 = {r["id"]: r["rank_micro"]
            for r in pagerank_micro(edges.repartition(5), n_iter=5).collect()}
    assert out == out2


def test_rrf_fuse_three_way(spark):
    from pydi_spark.llmdata import rrf_fuse

    def ranking(pairs):
        return spark.createDataFrame(pairs, "id long, rank int")

    a = ranking([(1, 1), (2, 2)])
    b = ranking([(2, 1), (3, 2)])
    c = ranking([(2, 3), (4, 1)])
    out = {r["id"]: r for r in rrf_fuse([a, b, c], k=4, rrf_k=60).collect()}
    # 2 appears in all three lists -> top score
    assert out[2]["rank"] == 1
    assert out[2]["rank_0"] == 2 and out[2]["rank_1"] == 1 and out[2]["rank_2"] == 3
    expected = 1.0 / 62 + 1.0 / 61 + 1.0 / 63
    assert abs(out[2]["rrf_score"] - expected) < 1e-12
    # absent ranks report 0 and contribute nothing
    assert out[4]["rank_0"] == 0 and out[4]["rank_1"] == 0
    assert abs(out[4]["rrf_score"] - 1.0 / 61) < 1e-12


def test_bpe_fertility(spark):
    from pydi_spark.llmdata import bpe_fertility

    rows = [(1, "aa aa bb", "s1"), (2, "aa", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["grp"]: r for r in
           bpe_fertility(df, [("a", "a")], word_filter=r"^[a-z]+$").collect()}
    # s1: 'aa'(x2) -> 1 piece each, 'bb' -> 2 pieces => 4 pieces / 3 words
    assert out["s1"]["total_words"] == 3 and out["s1"]["total_pieces"] == 4
    assert out["s1"]["fertility_ppm"] == 4 * 1000000 // 3
    assert out["s2"]["fertility_ppm"] == 1000000


def test_gram_duplication(spark):
    from pydi_spark.llmdata import gram_duplication

    rows = [(1, "a b a b a b", "s1"), (2, "x y z w", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["grp"]: r for r in gram_duplication(df, n=2).collect()}
    # s1 grams: ab ba ab ba ab -> 5 total, 2 distinct
    assert out["s1"]["total_grams"] == 5 and out["s1"]["distinct_grams"] == 2
    assert out["s1"]["dup_mass_ppm"] == 3 * 1000000 // 5
    assert out["s2"]["dup_mass_ppm"] == 0
    out2 = {r["grp"]: (r["total_grams"], r["distinct_grams"])
            for r in gram_duplication(df.repartition(4), n=2).collect()}
    assert out2 == {k: (v["total_grams"], v["distinct_grams"])
                    for k, v in out.items()}


def test_leakage_safe_split(spark):
    from pydi_spark.llmdata import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [("0", "1"), ("1", "2"), ("5", "6"), ("10", "11")],
        "id1 string, id2 string",
    )
    out = {r["id"]: r for r in
           leakage_safe_split(docs, pairs, train=0.6, valid=0.2).collect()}
    assert len(out) == 40
    # every cluster lands on one side
    for cluster in (("0", "1", "2"), ("5", "6"), ("10", "11")):
        splits = {out[i]["split"] for i in cluster}
        cids = {out[i]["cluster_id"] for i in cluster}
        assert len(splits) == 1 and len(cids) == 1
    assert {r["split"] for r in out.values()} <= {"train", "valid", "test"}
    # partition independence
    out2 = {r["id"]: (r["cluster_id"], r["split"]) for r in
            leakage_safe_split(docs.repartition(7), pairs.repartition(3),
                               train=0.6, valid=0.2).collect()}
    assert out2 == {k: (v["cluster_id"], v["split"]) for k, v in out.items()}


def test_contrastive_pairs(spark):
    from pydi_spark.llmdata import contrastive_pairs

    docs = spark.createDataFrame([(i, "t") for i in range(30)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([("1", "2"), ("5", "6")],
                                  "id1 string, id2 string")
    out = contrastive_pairs(pairs, docs, k_negatives=3).collect()
    pos = [r for r in out if r["label"] == 1]
    neg = [r for r in out if r["label"] == 0]
    assert {(r["anchor"], r["partner"]) for r in pos} == {("1", "2"), ("5", "6")}
    assert all(r["partner"] != r["anchor"] for r in neg)
    assert 4 <= len(neg) <= 6  # <= k per anchor (self-collisions drop)
    # deterministic under repartition
    out2 = contrastive_pairs(pairs.repartition(3), docs.repartition(7),
                             k_negatives=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_blocklist_filter(spark):
    from pydi_spark.llmdata import blocklist_filter

    rows = [(1, "clean text here"), (2, "contains BadWord here"),
            (3, "badword inside compound-badword token")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = {r["id"]: r for r in
           blocklist_filter(df, ["badword"], mode="token").collect()}
    assert tok["1"]["keep"] == 1
    assert tok["2"]["keep"] == 0 and tok["2"]["n_hits"] == 1
    # 'compound-badword' splits into tokens, so token mode catches it
    assert tok["3"]["keep"] == 0
    sub = {r["id"]: r for r in
           blocklist_filter(df, ["ins"], mode="substring").collect()}
    assert sub["3"]["keep"] == 0 and sub["1"]["keep"] == 1


def test_remove_repeated_spans_first_occurrence_survives(spark):
    """Corpus-level exact-substring dedup: the minimum (doc_id, pos)
    occurrence of a repeated span keeps its text; later occurrences'
    token positions are dropped; untouched docs pass through."""
    from pydi_spark.llmdata import remove_repeated_spans

    rows = [
        (1, "a b c d e f g h x y"),
        (2, "p q a b c d e f g h r"),
        (3, "totally different words here seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_repeated_spans(
        df, span_tokens=8, min_docs=2).collect()}
    assert out[1]["clean_text"] == "a b c d e f g h x y"
    assert (out[1]["n_tokens_total"], out[1]["n_tokens_kept"]) == (10, 10)
    assert out[2]["clean_text"] == "p q r"
    assert (out[2]["n_tokens_total"], out[2]["n_tokens_kept"]) == (11, 3)
    assert out[3]["n_tokens_kept"] == out[3]["n_tokens_total"] == 8
    # partition independence: identical output under a different layout
    out2 = {r["doc_id"]: tuple(r) for r in remove_repeated_spans(
        df.repartition(7), span_tokens=8, min_docs=2).collect()}
    assert out2 == {k: tuple(v) for k, v in out.items()}
    # a doc shorter than one span is returned intact with zero drops
    tiny = spark.createDataFrame([(9, "just three words")],
                                 "doc_id long, text string")
    t = remove_repeated_spans(tiny, span_tokens=8, min_docs=2).collect()[0]
    assert t["clean_text"] == "just three words"
    assert t["n_tokens_kept"] == 3


def test_lsh_tuning_helpers():
    """S-curve math: monotone in jaccard; suggest_bands returns the
    most selective banding that still meets recall at the threshold."""
    from pydi_spark.llmdata import lsh_candidate_probability, suggest_bands

    ps = [lsh_candidate_probability(s, 16, 4) for s in (0.1, 0.4, 0.7, 0.95)]
    assert ps == sorted(ps) and ps[0] < 0.01 and ps[-1] > 0.99
    b = suggest_bands(0.7, 16, min_recall=0.9)
    assert b == 8
    assert lsh_candidate_probability(0.7, 16, b) >= 0.9
    # no divisor of 4 hashes catches 0.2-jaccard pairs at 99% recall
    import pytest as _pytest
    with _pytest.raises(ValueError):
        suggest_bands(0.05, 4, min_recall=0.99)


def test_corpus_cleanup_cascade(spark):
    """blocklist -> exact dedup -> near-dup dedup with per-stage
    attrition report; id_digest pins the surviving id SET."""
    from pydi_spark.llmdata import corpus_cleanup

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    rows = [
        (1, base),                                   # survives everything
        (2, base),                                   # exact dup of 1
        (3, base + " extra"),                        # near-dup of 1
        (4, "totally different words about spark catalyst planning"),
        (5, "contains the forbidden badword token here right now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean, report = corpus_cleanup(df, ["badword"], max_hamming=6)
    rep = {r["stage"]: r for r in report.collect()}
    assert [rep[i]["stage_name"] for i in range(4)] == [
        "input", "blocklist", "exact_dedup", "near_dedup"]
    assert rep[0]["n_docs"] == 5
    assert rep[1]["n_docs"] == 4          # doc 5 blocked
    assert rep[2]["n_docs"] == 3          # doc 2 exact-deduped
    survivors = {r["id"] for r in clean.collect()}
    assert rep[3]["n_docs"] == len(survivors)
    assert "1" in survivors and "4" in survivors
    assert "2" not in survivors and "5" not in survivors
    # digests differ between stages that differ, and the attrition is
    # monotone non-increasing
    counts = [rep[i]["n_docs"] for i in range(4)]
    assert counts == sorted(counts, reverse=True)
    assert rep[0]["id_digest"] != rep[1]["id_digest"]


def test_lsh_recall_probe_scurve(spark):
    """Empirical S-curve sanity: recall is (weakly) monotone in the
    jaccard bucket at the top end — exact duplicates share all bands,
    disjoint docs share none."""
    from pydi_spark.llmdata import lsh_recall_probe

    base = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = ([(i, base) for i in range(4)]                 # exact dups
            + [(10 + i, f"unique{i} words{i} only{i} here{i}")
               for i in range(8)])                        # disjoint
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in lsh_recall_probe(
        df, sample_k=12, num_hashes=8, bands=4).collect()}
    # identical docs -> bucket 10, every pair a candidate
    assert out[10]["recall_ppm"] == 1000000
    # disjoint docs -> bucket 0, (near-)zero candidates
    assert out[0]["recall_ppm"] <= 10000
    for b in out.values():
        assert b["n_candidates"] <= b["n_pairs"]


def test_bloom_prefilter_dedup_exact(spark):
    """Bloom prefilter routes work but never changes the answer:
    result == plain exact anti-join on every corpus shape, including
    adversarially tiny filters (high fpp -> everything verifies) and
    null keys (never duplicates)."""
    from pydi_spark.llmdata import bloom_bitmap, bloom_prefilter_dedup

    store = spark.createDataFrame(
        [(i, f"doc number {i} content") for i in range(40)]
        + [(100, None)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(200 + i, f"doc number {i} content") for i in range(0, 20)]  # dups
        + [(300 + i, f"fresh text {i}") for i in range(25)]           # new
        + [(400, None)],                                              # null
        "doc_id long, text string",
    )
    expect = {300 + i for i in range(25)} | {400}
    for m_bits in (64, 1 << 16):  # saturated tiny filter AND a real one
        out = bloom_prefilter_dedup(batch, store, m_bits=m_bits, n_hashes=5)
        assert {r["doc_id"] for r in out.collect()} == expect
        assert out.columns == batch.columns
    # no false negatives on the bitmap itself: every store key probes hit
    arr = bloom_bitmap(store.select("text"), "text", 1 << 16, 5)
    from pydi_spark.llmdata.bloom import _bloom_positions_py

    for i in range(40):
        for p in _bloom_positions_py(f"doc number {i} content", 1 << 16, 5):
            assert (int(arr[p >> 6]) >> (p & 63)) & 1, "false negative"


def test_bloom_prefilter_prunes_and_is_total(spark):
    """Disjoint batch vs a reasonable filter: (almost) every row takes
    the map-side definitely-new path; and both empty-input edges hold."""
    import pyspark.sql.functions as F

    from pydi_spark.llmdata import bloom_prefilter_dedup
    from pydi_spark.llmdata.bloom import bloom_bitmap, _bloom_positions_py

    store = spark.createDataFrame(
        [(i, f"stored {i}") for i in range(50)], "doc_id long, text string"
    )
    m_bits, k = 1 << 16, 5
    arr = bloom_bitmap(store.select("text"), "text", m_bits, k)
    fresh = [f"brand new {i}" for i in range(200)]
    fp = sum(
        all((int(arr[p >> 6]) >> (p & 63)) & 1
            for p in _bloom_positions_py(t, m_bits, k))
        for t in fresh
    )
    # 250 set bits max in a 65536-bit filter -> fp rate ~(k*n/m)^k ~ 0
    assert fp <= 2, f"false-positive rate implausibly high: {fp}/200"
    # totality: empty store (all definitely-new) and empty batch
    empty = spark.createDataFrame([], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "x"), (2, "stored 3")], "doc_id long, text string"
    )
    assert bloom_prefilter_dedup(batch, empty).count() == 2
    assert bloom_prefilter_dedup(empty, store).count() == 0


def test_ngram_containment_subset_doc(spark):
    """A document fully quoted inside a longer one: low Jaccard, full
    containment — the wrapper-page case Jaccard dedup misses."""
    from pydi_spark.llmdata import (
        ngram_containment_duplicates,
        ngram_jaccard_duplicates,
    )

    inner = "alpha beta gamma delta epsilon zeta eta theta"
    outer = ("wrapper header junk words " + inner
             + " footer trailing boilerplate lines here extra padding tokens")
    docs = spark.createDataFrame(
        [("a", inner), ("b", outer), ("c", "unrelated content entirely")],
        ["doc_id", "text"],
    )
    cont = ngram_containment_duplicates(docs, containment_threshold=0.9).collect()
    assert [(r["id1"], r["id2"], r["containment"]) for r in cont] == [
        ("a", "b", 1.0)
    ]
    jac = ngram_jaccard_duplicates(docs, jaccard_threshold=0.5).collect()
    assert jac == []  # jaccard misses the subset pair


def test_ngram_containment_empty_input(spark):
    from pydi_spark.llmdata import ngram_containment_duplicates

    empty = spark.createDataFrame([], "doc_id string, text string")
    assert ngram_containment_duplicates(empty).count() == 0


# ----------------------------------------------------- distributed k-means

def test_kmeans_separates_blobs(spark):
    from pydi_spark.llmdata import kmeans_cluster

    rows = [(i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(0, 30)]
    rows += [(i, [-10.0, -10.0 - (i % 3) * 0.01]) for i in range(30, 60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_cluster(df, k=2, n_iter=3).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    assert len(got) == 60
    assert set(by_cluster) == {0, 1}
    blobs = [set(range(0, 30)), set(range(30, 60))]
    assert sorted(by_cluster.values(), key=min) == blobs


def test_kmeans_fit_deterministic_across_partitioning(spark):
    from pydi_spark.llmdata import kmeans_fit

    rows = [
        (i, [((i * 37) % 101) / 50.0 - 1.0, ((i * 91) % 97) / 50.0 - 1.0,
             ((i * 13) % 89) / 50.0 - 1.0])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = kmeans_fit(df.repartition(1), k=4, n_iter=2)
    c8 = kmeans_fit(df.repartition(8), k=4, n_iter=2)
    assert c1 == c8
    assert all(isinstance(v, int) for row in c1 for v in row)


def test_kmeans_assign_tie_breaks_to_lowest_cluster(spark):
    from pydi_spark.llmdata import kmeans_assign

    df = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    cents = [[0, 0], [1_000_000, 1_000_000], [0, 0]]
    r = kmeans_assign(df, cents).collect()[0]
    assert (r["cluster"], r["dist2"]) == (0, 2 * 500_000 ** 2)


def test_kmeans_validation(spark):
    import pytest as _pytest

    from pydi_spark.llmdata import kmeans_assign, kmeans_fit

    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        kmeans_fit(empty, k=2)
    with _pytest.raises(ValueError):
        kmeans_fit(df, k=2)   # k exceeds corpus
    with _pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with _pytest.raises(ValueError):
        kmeans_assign(df, [])
    # assignment (a query op, not a trainer) is total on empty input
    assert kmeans_assign(empty, [[0, 0]]).collect() == []


# ----------------------------------------------------- mixture planning

def test_plan_data_mixture(spark):
    from pydi_spark.llmdata import plan_data_mixture

    df = spark.createDataFrame(
        [("web", 100), ("web", 300), ("code", 200), ("books", 50)],
        ["source", "n"],
    )
    got = {
        r["source"]: (r["available"], r["weight_ppm"], r["quota"],
                      r["epochs_milli"])
        for r in plan_data_mixture(
            df, {"web": 500_000, "code": 500_000}, budget=1000,
            count_col="n",
        ).collect()
    }
    assert got["web"] == (400, 500_000, 500, 1250)    # 1.25 epochs
    assert got["code"] == (200, 500_000, 500, 2500)   # repeat 2.5x
    assert got["books"] == (50, 0, 0, 0)              # not in the recipe
    import pytest as _pytest

    with _pytest.raises(ValueError):
        plan_data_mixture(df, {}, budget=10)
    with _pytest.raises(ValueError):
        plan_data_mixture(df, {"web": 1}, budget=0)


def test_epoch_expand_deterministic(spark):
    from pydi_spark.llmdata import epoch_expand

    rows = [(i, "web") for i in range(200)] + [(i, "code") for i in range(200, 260)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = epoch_expand(df, {"web": 2500, "code": 1000})
    by_src = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    # code: identity pass
    assert by_src["code"] == 60
    # web: 2 full copies + ~50% fractional (md5-deterministic)
    assert 400 < by_src["web"] < 500
    # epochs labeled 1..3 for web, fractional keeps carry epoch 3
    assert {r["epoch"] for r in out.where("source = 'web'").select(
        "epoch").distinct().collect()} == {1, 2, 3}
    # deterministic under repartitioning
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(
        tuple(r)
        for r in epoch_expand(
            df.repartition(7), {"web": 2500, "code": 1000}
        ).collect()
    )
    assert a == b
    # absent source contributes nothing; zero plan is empty
    assert epoch_expand(df, {"none": 5000}).count() == 0


def test_plan_data_mixture_absent_source_still_planned(spark):
    """Review fix: a recipe source with zero corpus rows must appear
    with available=0 (an unsatisfiable quota the caller needs to SEE)."""
    from pydi_spark.llmdata import plan_data_mixture

    df = spark.createDataFrame([("web", 100)], ["source", "n"])
    got = {
        r["source"]: (r["available"], r["quota"], r["epochs_milli"])
        for r in plan_data_mixture(
            df, {"web": 500_000, "books": 500_000}, budget=1000,
            count_col="n",
        ).collect()
    }
    assert got["books"] == (0, 500, 0)
    assert got["web"] == (100, 500, 5000)


def test_kmeans_ignores_null_vectors(spark):
    from pydi_spark.llmdata import kmeans_assign, kmeans_fit

    df = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0]), (3, [1.0, 1.0]), (4, None)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(df, k=2, n_iter=1)
    assert len(cents) == 2
    got = {r["id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()}
    assert got[1] is None and got[4] is None
    assert got[2] is not None and got[3] is not None
    import pytest as _pytest

    all_null = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError):
        kmeans_fit(all_null, k=1)


def test_triangle_count_brute_force(spark):
    import itertools
    import random

    from pydi_spark.llmdata import triangle_count

    for seed in (1, 8):
        rng = random.Random(seed)
        nodes = list(range(14))
        edges = {
            tuple(sorted(rng.sample(nodes, 2))) for _ in range(40)
        }
        # noise the operator must normalize away: self loop, reversed
        # duplicate, null endpoint
        rows = [(a, b) for a, b in edges] + [(3, 3), (None, 1)]
        rows += [(b, a) for a, b in list(edges)[:5]]
        df = spark.createDataFrame(rows, "id1 int, id2 int")
        got = triangle_count(df).collect()[0]["n_triangles"]
        brute = sum(
            1
            for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in edges and (x, z) in edges and (y, z) in edges
        )
        assert got == brute, f"seed {seed}: {got} != {brute}"
    # empty graph
    empty = spark.createDataFrame([], "id1 int, id2 int")
    assert triangle_count(empty).collect()[0]["n_triangles"] == 0


def test_clustering_coefficient_known_graph(spark):
    """Square with one diagonal: a-b-c-d-a plus a-c. Triangles abc, acd.
    Degrees a=3 b=2 c=3 d=2 -> coef a,c = 2*2/(3*2) = 2/3; b,d = 1."""
    from pydi_spark.llmdata import clustering_coefficient

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
         ("c", "a"),  # reversed duplicate collapses
         ("b", "b")],  # self-loop drops
        "id1 string, id2 string",
    )
    got = {r["id"]: r for r in clustering_coefficient(edges).collect()}
    assert {(k, v["degree"], v["n_triangles"], v["coef_ppm"])
            for k, v in got.items()} == {
        ("a", 3, 2, 666666), ("b", 2, 1, 1000000),
        ("c", 3, 2, 666666), ("d", 2, 1, 1000000),
    }
    # global triangle count must agree with the per-node attribution
    from pydi_spark.llmdata import triangle_count
    n_tri = triangle_count(edges).collect()[0]["n_triangles"]
    assert sum(v["n_triangles"] for v in got.values()) == 3 * n_tri == 6


def test_k_core_peeling_cascade(spark):
    """Triangle {x,y,z} with a 3-node tail x-t1-t2-t3: the 2-core must
    peel the tail one layer per round (t3 -> t2 -> t1), proving the
    iteration runs to fixpoint, and keep exactly the triangle."""
    from pydi_spark.llmdata import k_core

    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x"),
         ("x", "t1"), ("t1", "t2"), ("t2", "t3")],
        "id1 string, id2 string",
    )
    assert {r["id"] for r in k_core(edges, k=2).collect()} == {"x", "y", "z"}
    # k above the max core -> empty
    assert k_core(edges, k=3).count() == 0
    # k=1 keeps every non-isolated node
    assert k_core(edges, k=1).count() == 6
    import pytest as _pytest
    with _pytest.raises(ValueError):
        k_core(edges, k=0)


def test_k_core_raises_on_iteration_cap(spark):
    """VERDICT r8 #2: a chain peels 2 endpoints per round, so a 20-node
    path at k=2 needs ~10 rounds; with max_iterations=3 the peel CANNOT
    reach the fixpoint and k_core must RAISE (refuse-loudly) instead of
    silently returning the residual superset of the (empty) 2-core."""
    import pytest as _pytest

    from pydi_spark.llmdata import k_core

    chain = spark.createDataFrame(
        [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(20)],
        "id1 string, id2 string",
    )
    with _pytest.raises(RuntimeError, match="fixpoint"):
        k_core(chain, k=2, max_iterations=3)
    # with enough rounds the same graph converges (to the empty 2-core)
    assert k_core(chain, k=2, max_iterations=50).count() == 0


def test_k_core_empty_and_partition_invariance(spark):
    from pydi_spark.llmdata import clustering_coefficient, k_core

    empty = spark.createDataFrame([], "id1 string, id2 string")
    assert k_core(empty, k=2).count() == 0
    assert clustering_coefficient(empty).count() == 0
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)]
        + [(f"n{i}", f"n{(i + 2) % 7}") for i in range(7)],
        "id1 string, id2 string",
    )
    a = sorted(map(tuple, clustering_coefficient(edges).collect()))
    b = sorted(map(tuple, clustering_coefficient(edges.repartition(13)).collect()))
    assert a == b


def test_novelty_scores(spark):
    """Batch docs vs a reference corpus: a doc fully covered by the
    reference scores 0 ppm, a fully-new doc 1e6, a half-covered doc the
    exact integer ratio; short docs fall back to the whole-sequence
    gram (the decontaminate edge rule)."""
    from pydi_spark.llmdata import novelty_scores

    reference = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "epsilon zeta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),        # grams all in reference
            (2, "nova stella prima"),       # fully novel
            (3, "alpha beta nova stella"),  # 1 of 3 grams known
            (4, "zeta"),                    # short: single gram, novel
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in novelty_scores(batch, reference, n=2).collect()}
    assert (got["1"]["n_ngrams"], got["1"]["n_novel"], got["1"]["novelty_ppm"]) == (2, 0, 0)
    assert (got["2"]["n_ngrams"], got["2"]["novelty_ppm"]) == (2, 1000000)
    assert (got["3"]["n_ngrams"], got["3"]["n_novel"], got["3"]["novelty_ppm"]) == (3, 2, 666666)
    # "zeta" alone is the whole-sequence gram; reference's short doc
    # contributes "epsilon zeta" as ITS gram -> no match -> novel
    assert got["4"]["novelty_ppm"] == 1000000


def test_keep_best_duplicates(spark):
    """Winner per duplicate cluster = (score DESC, id ASC); unpaired
    docs keep themselves; ties break on min id."""
    from pydi_spark.llmdata import keep_best_duplicates

    docs = spark.createDataFrame(
        [("a", 10), ("b", 30), ("c", 30), ("d", 5), ("e", 99)],
        "doc_id string, q int",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "d2_missing")],  # d pairs with absent doc
        "id1 string, id2 string",
    )
    got = {r["doc_id"]: r for r in
           keep_best_duplicates(docs, pairs, "q").collect()}
    # cluster {a,b,c}: best score 30 tie -> min id 'b'
    assert got["a"]["keep_id"] == "b" and got["a"]["is_kept"] == 0
    assert got["b"]["is_kept"] == 1 and got["c"]["is_kept"] == 0
    assert got["a"]["cluster_id"] == "a"  # min-id label, stable
    # 'd' clustered with an id absent from the corpus: d is the only
    # scored member -> keeps itself
    assert got["d"]["is_kept"] == 1
    # unpaired doc keeps itself
    assert got["e"]["keep_id"] == "e" and got["e"]["is_kept"] == 1
    kept = keep_best_duplicates(docs, pairs, "q").where("is_kept = 1")
    assert {r["doc_id"] for r in kept.collect()} == {"b", "d", "e"}


def test_script_profile(spark):
    from pydi_spark.llmdata import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world 42"),
            (2, "привет мир"),
            (3, "αβγ abc"),          # greek ties latin 3-3 -> latin wins
            (4, "中文 text here more"),  # latin outnumbers cjk
            (5, "中文字字字 ab"),
            (6, "!!! ..."),
            (7, None),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert got[1]["dominant_script"] == "latin"
    assert got[1]["n_latin"] == 10 and got[1]["n_digit"] == 2
    assert got[2]["dominant_script"] == "cyrillic" and got[2]["n_cyrillic"] == 9
    assert got[3]["dominant_script"] == "latin"  # tie -> fixed priority
    assert got[4]["dominant_script"] == "latin" and got[4]["n_cjk"] == 2
    assert got[5]["dominant_script"] == "cjk"
    assert got[6]["dominant_script"] == "other"
    assert got[7]["dominant_script"] == "other" and got[7]["n_chars"] == 0


def test_label_propagation_communities(spark):
    """Two triangles joined by one weak bridge: CC would fuse them;
    synchronous LPA (min-label ties) settles on one label per triangle
    — worked by hand for 4 rounds: {a,b,c}->a, {d,e,f}->c."""
    from pydi_spark.llmdata import label_propagation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"),
         ("c", "d")],
        "id1 string, id2 string",
    )
    got = {r["id"]: r["label"]
           for r in label_propagation(edges, n_iter=4).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "c", "e": "c", "f": "c"}
    # synchronous schedule -> partition-independent
    got13 = {r["id"]: r["label"]
             for r in label_propagation(
                 edges.repartition(13), n_iter=4).collect()}
    assert got13 == got


def test_phrase_match_positional_semantics(spark):
    """Overlapping repeated-term phrase, multi-term adjacency, case
    folding, and the no-tokens refusal."""
    import pytest as _pytest

    from pydi_spark.llmdata import phrase_match

    docs = spark.createDataFrame(
        [(1, "batch batch batch stream"),      # 2 OVERLAPPING matches
         (2, "Batch, BATCH!"),                  # punctuation + case -> 1
         (3, "batch stream batch"),             # non-adjacent -> no row
         (4, "the fast batch batch end")],      # 1
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(docs, "batch batch").collect()}
    assert got == {1: 2, 2: 1, 4: 1}
    # multi-term: order matters
    got3 = {r["doc_id"]: r["n_matches"]
            for r in phrase_match(docs, "batch stream").collect()}
    assert got3 == {1: 1, 3: 1}
    assert phrase_match(docs, "stream batch").count() == 1  # doc 3 only
    # list input + single term = term frequency
    got1 = {r["doc_id"]: r["n_matches"]
            for r in phrase_match(docs, ["batch"]).collect()}
    assert got1 == {1: 3, 2: 2, 3: 2, 4: 2}
    with _pytest.raises(ValueError):
        phrase_match(docs, " , !")


def test_personalized_pagerank_seed_proximity(spark):
    """Two 3-cliques joined by one bridge, seed in clique 1: mass must
    concentrate in the seed clique and decay across the bridge;
    conservation ~ n*1e6 within the floor bias; empty seed set raises."""
    import pytest as _pytest

    from pydi_spark.llmdata import personalized_pagerank_micro

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"),
         ("c", "d")],
        "id1 string, id2 string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["rank_micro"]
           for r in personalized_pagerank_micro(edges, seeds, n_iter=8).collect()}
    assert set(got) == set("abcdef")
    # the seed outranks everything; its own clique outranks the far one
    assert got["a"] == max(got.values())
    assert min(got["b"], got["c"]) > max(got["e"], got["f"])
    # total walk mass conserved up to the documented floor bias
    assert 0.9 * 6_000_000 < sum(got.values()) <= 6_000_000
    # every node reachable -> strictly positive mass
    assert all(v > 0 for v in got.values())
    with _pytest.raises(ValueError, match="seed"):
        personalized_pagerank_micro(
            edges, spark.createDataFrame([("zz",)], "id string"))


def test_link_prediction_scores_known_graph(spark):
    """Square a-b-c-d-a plus pendant e on a: worked by hand.
    Non-edge diagonals (a,c) and (b,d) share 2 neighbours;
    (b,e)/(d,e) share only a. Degrees: a=3, b=c=d=2, e=1."""
    from pydi_spark.llmdata import link_prediction_scores

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "e")],
        "id1 string, id2 string",
    )
    got = {(r["id1"], r["id2"]): r.asDict()
           for r in link_prediction_scores(edges).collect()}
    assert set(got) == {("a", "c"), ("b", "d"), ("b", "e"), ("d", "e")}
    ac = got[("a", "c")]
    # shared: b (deg 2) and d (deg 2) -> ra = 2 * (1e6 div 2)
    assert ac["common_neighbors"] == 2
    assert ac["ra_micro"] == 1_000_000
    # jaccard = 2 / (3 + 2 - 2) = 2/3 -> 666666 ppm (floor)
    assert ac["jaccard_ppm"] == 666_666
    assert ac["pref_attach"] == 6
    bd = got[("b", "d")]
    # shared: a (deg 3) and c (deg 2)
    assert bd["common_neighbors"] == 2
    assert bd["ra_micro"] == 333_333 + 500_000
    assert bd["jaccard_ppm"] == 1_000_000  # 2/(2+2-2)
    be = got[("b", "e")]
    # shared: a only (deg 3); jaccard 1/(2+1-1) = 1/2
    assert be["common_neighbors"] == 1
    assert be["ra_micro"] == 333_333
    assert be["jaccard_ppm"] == 500_000
    assert be["pref_attach"] == 2
    # existing edges never appear
    assert ("a", "b") not in got and ("a", "d") not in got


def test_link_prediction_hub_cap_and_min_common(spark):
    """max_degree removes the hub's wedges (its pairs vanish when it
    is the ONLY shared neighbour) but hub degree still counts at the
    endpoints; min_common prunes weak pairs."""
    from pydi_spark.llmdata import link_prediction_scores

    # star: h—x1..x4, plus x1—x2 (so (x1,x2) is an edge, (x3,x4) etc.
    # exist only through the hub)
    edges = spark.createDataFrame(
        [("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),
         ("x1", "x2")],
        "id1 string, id2 string",
    )
    full = {(r["id1"], r["id2"])
            for r in link_prediction_scores(edges).collect()}
    assert ("x3", "x4") in full and ("x1", "x3") in full
    capped = link_prediction_scores(edges, max_degree=3).collect()
    capped_pairs = {(r["id1"], r["id2"]) for r in capped}
    # hub (deg 4) no longer generates wedges -> only x1/x2-centred
    # wedges survive: (h, x2) via x1? no — h-x2 is an edge; x1 centre
    # gives (h, x2) edge-pair, x2 centre gives (h, x1) edge-pair ->
    # nothing left but pairs through sub-cap centres
    assert ("x3", "x4") not in capped_pairs
    # min_common=2: no non-edge pair here shares two neighbours
    assert link_prediction_scores(edges, min_common=2).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_common"):
        link_prediction_scores(edges, min_common=0)


def test_bfs_hops_levels_and_bounds(spark):
    """Path a-b-c-d-e plus isolated seed z: exact levels, radius
    bounds, early frontier exhaustion, empty-seed refusal."""
    import pytest as _pytest

    from pydi_spark.llmdata import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "id1 string, id2 string",
    )
    seeds = spark.createDataFrame([("a",), ("z",)], "id string")
    got = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, 2).collect()}
    # z is isolated but still surfaces at 0 (totality); d/e out of radius
    assert got == {"a": 0, "z": 0, "b": 1, "c": 2}
    # radius 10 exhausts the frontier early and covers the path
    full = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, 10).collect()}
    assert full == {"a": 0, "z": 0, "b": 1, "c": 2, "d": 3, "e": 4}
    # multi-source: nearest seed wins
    two = {r["id"]: r["hops"] for r in bfs_hops(
        edges, spark.createDataFrame([("a",), ("e",)], "id string"),
        3).collect()}
    assert two == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}
    # max_hops=0 returns just the seeds
    assert {r["id"] for r in bfs_hops(edges, seeds, 0).collect()} == {"a", "z"}
    # partition independence
    p13 = {r["id"]: r["hops"] for r in bfs_hops(
        edges.repartition(13), seeds.repartition(5), 2).collect()}
    assert p13 == got
    with _pytest.raises(ValueError, match="empty seed"):
        bfs_hops(edges, spark.createDataFrame([], "id string"), 2)


def test_hits_micro_bipartite_ordering(spark):
    """u1 -> {t1, t2}, u2 -> t1, u3 -> t1: t1 must out-rank t2 as an
    authority; u1 (points at both) must out-rank u2/u3, which are
    symmetric and must tie exactly. Mass per half stays ~ n*1e6."""
    from pydi_spark.llmdata import hits_micro

    edges = spark.createDataFrame(
        [("u1", "t1"), ("u1", "t2"), ("u2", "t1"), ("u3", "t1"),
         ("u2", "t1")],  # duplicate edge must NOT vote twice
        "src string, dst string",
    )
    got = {r["id"]: (r["hub_micro"], r["auth_micro"])
           for r in hits_micro(edges, n_iter=4).collect()}
    assert set(got) == {"u1", "u2", "u3", "t1", "t2"}
    assert got["t1"][1] > got["t2"][1] > 0
    assert got["u1"][0] > got["u2"][0] > 0
    assert got["u2"] == got["u3"]
    # sinks have zero hub mass; pure sources zero authority
    assert got["t1"][0] == 0 and got["u1"][1] == 0
    n = 5
    hub_total = sum(v[0] for v in got.values())
    auth_total = sum(v[1] for v in got.values())
    assert 0.99 * n * 1_000_000 < hub_total <= n * 1_000_000
    assert 0.99 * n * 1_000_000 < auth_total <= n * 1_000_000
    # partition independence
    got13 = {r["id"]: (r["hub_micro"], r["auth_micro"])
             for r in hits_micro(edges.repartition(13), n_iter=4).collect()}
    assert got13 == got
    # empty edge list -> empty (total function)
    empty = spark.createDataFrame([], "src string, dst string")
    assert hits_micro(empty).count() == 0


def test_weighted_pagerank_weight_steering(spark):
    """Triangle a-b-c where the a-b edge weighs 10 and the others 1:
    a and b must out-rank c (mass flows along the heavy edge); with
    all weights equal the result must coincide with the unweighted
    pagerank_micro exactly. Non-positive weights refuse."""
    import pytest as _pytest

    from pydi_spark.llmdata import pagerank_micro, weighted_pagerank_micro

    heavy = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 1), ("c", "a", 1)],
        "id1 string, id2 string, weight int",
    )
    got = {r["id"]: r["rank_micro"]
           for r in weighted_pagerank_micro(heavy, n_iter=8).collect()}
    assert got["a"] == got["b"] > got["c"] > 0
    # mass conservation up to the floor bias
    assert 0.9 * 3_000_000 < sum(got.values()) <= 3_000_000
    # uniform weights == unweighted pagerank, bit for bit
    unif = spark.createDataFrame(
        [("a", "b", 7), ("b", "c", 7), ("c", "a", 7)],
        "id1 string, id2 string, weight int",
    )
    w = {r["id"]: r["rank_micro"]
         for r in weighted_pagerank_micro(unif, n_iter=5).collect()}
    u = {r["id"]: r["rank_micro"]
         for r in pagerank_micro(unif.drop("weight"), n_iter=5).collect()}
    assert w == u
    # multi-edge collapse: duplicate (a,b,5)+(a,b,5) == single (a,b,10)
    dup = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", 5), ("b", "c", 1), ("c", "a", 1)],
        "id1 string, id2 string, weight int",
    )
    d = {r["id"]: r["rank_micro"]
         for r in weighted_pagerank_micro(dup, n_iter=8).collect()}
    assert d == got
    with _pytest.raises(ValueError, match="positive"):
        weighted_pagerank_micro(
            spark.createDataFrame(
                [("a", "b", 0)], "id1 string, id2 string, weight int"
            )
        )


def test_weighted_pagerank_rejects_masked_bad_weights(spark):
    """A NULL or negative per-edge weight must raise even when a
    healthy duplicate of the SAME pair would mask it in the collapsed
    sum (r9 self-review finding)."""
    import pytest as _pytest

    from pydi_spark.llmdata import weighted_pagerank_micro

    masked_null = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", None), ("b", "c", 1), ("c", "a", 1)],
        "id1 string, id2 string, weight int",
    )
    with _pytest.raises(ValueError, match="positive"):
        weighted_pagerank_micro(masked_null)
    masked_neg = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", -2), ("b", "c", 1), ("c", "a", 1)],
        "id1 string, id2 string, weight int",
    )
    with _pytest.raises(ValueError, match="positive"):
        weighted_pagerank_micro(masked_neg)


def test_modularity_score_hand_computed(spark):
    """Two triangles + one bridge, communities = the triangles:
    m=7, D=14, e_A=e_B=3, d_A=d_B=7 ->
    q_num = 2*14*6 - (49+49) = 70, q_den = 196, q = 70/196."""
    import pytest

    from pydi_spark.llmdata import modularity_score

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "id1 int, id2 int",
    )
    comm = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "B")],
        "id int, community string",
    )
    row = modularity_score(edges, comm).collect()[0]
    assert (row["n_nodes"], row["n_communities"], row["m_edges"]) == (6, 2, 7)
    assert (row["q_num"], row["q_den"]) == (70, 196)
    assert abs(row["q"] - 70 / 196) < 1e-12
    # everything in ONE community: e_in = m, d_c = D -> q = 0 exactly
    one = comm.select("id", F.lit("Z").alias("community"))
    r1 = modularity_score(edges, one).collect()[0]
    assert r1["q_num"] == 0 and r1["q"] == 0.0
    # refusals: uncovered node / overlapping assignment
    with pytest.raises(ValueError, match="no community"):
        modularity_score(edges, comm.where("id != 6")).collect()
    with pytest.raises(ValueError, match="partitions"):
        modularity_score(
            edges,
            comm.union(
                spark.createDataFrame([(1, "B")], "id int, community string")
            ),
        ).collect()


def test_feature_propagation_hand_computed(spark):
    """Path 1-2-3 with x=[0, 600, 0]: one round of the self-inclusive
    neighbour mean gives [300, 200, 300]; isolated featured nodes keep
    their value; negative and fractional inputs are refused."""
    import pytest

    from pydi_spark.llmdata import feature_propagation

    e = spark.createDataFrame([(1, 2), (2, 3)], "id1 int, id2 int")
    feats = spark.createDataFrame(
        [(1, 0), (2, 600), (3, 0), (9, 77)], "id int, value_micro long"
    )
    got = {
        r["id"]: r["value_micro"]
        for r in feature_propagation(e, feats, n_iter=1).collect()
    }
    assert got == {1: 300, 2: 200, 3: 300, 9: 77}
    # two rounds: x1=[300,200,300] -> node2: (200+600) div 3 = 266
    got2 = {
        r["id"]: r["value_micro"]
        for r in feature_propagation(e, feats, n_iter=2).collect()
    }
    assert got2 == {1: 250, 2: 266, 3: 250, 9: 77}
    with pytest.raises(ValueError, match="negative"):
        feature_propagation(
            e, spark.createDataFrame([(1, -5)], "id int, value_micro long"),
            n_iter=1,
        ).collect()
    with pytest.raises(TypeError, match="integral"):
        feature_propagation(
            e, spark.createDataFrame([(1, 0.5)], "id int, value_micro double"),
            n_iter=1,
        )


def test_degree_assortativity_hand_computed(spark):
    """Star K_{1,3} is perfectly disassortative: M=6, S1=12, S2=30,
    P=18 -> r_num=-36, r_den=36, r=-1. A cycle is regular: r_den=0 ->
    r defined as 0."""
    from pydi_spark.llmdata import degree_assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id1 int, id2 int"
    )
    r = degree_assortativity(star).collect()[0]
    assert (r["n_nodes"], r["m_edges"]) == (4, 3)
    assert (r["r_num"], r["r_den"], r["r"]) == (-36, 36, -1.0)
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "id1 int, id2 int")
    rc = degree_assortativity(cyc).collect()[0]
    assert rc["r_den"] == 0 and rc["r"] == 0.0


def test_pps_systematic_sample_invariants(spark):
    """sum(n_hits) == k always; uniform weights give exactly k distinct
    rows; a heavy row (w > T/k) absorbs multiple hits; the selection is
    partition-independent; zero/fractional weights and k < 1 refuse."""
    import pytest

    from pydi_spark.llmdata import pps_systematic_sample

    uni = spark.createDataFrame(
        [(i, 1) for i in range(100)], "doc_id long, w long"
    )
    out = pps_systematic_sample(uni, 10, "w", "doc_id").collect()
    assert len(out) == 10 and all(r["n_hits"] == 1 for r in out)

    skew = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(57)], "doc_id long, w long"
    )
    o2 = pps_systematic_sample(skew, 10, "w", "doc_id").collect()
    assert sum(r["n_hits"] for r in o2) == 10

    heavy = spark.createDataFrame(
        [(0, 900)] + [(i, 10) for i in range(1, 11)], "doc_id long, w long"
    )
    o3 = {r["doc_id"]: r["n_hits"]
          for r in pps_systematic_sample(heavy, 5, "w", "doc_id").collect()}
    assert o3[0] >= 4 and sum(o3.values()) == 5

    a = sorted(
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(
            skew.repartition(13), 10, "w", "doc_id"
        ).collect()
    )
    assert a == sorted((r["doc_id"], r["n_hits"]) for r in o2)

    with pytest.raises(ValueError, match="non-positive"):
        pps_systematic_sample(
            uni.withColumn("w", F.lit(0)), 3, "w", "doc_id"
        ).collect()
    with pytest.raises(TypeError, match="integral"):
        pps_systematic_sample(
            uni.withColumn("w", F.col("w").cast("double")), 3, "w", "doc_id"
        )
    with pytest.raises(ValueError, match="k must"):
        pps_systematic_sample(uni, 0, "w", "doc_id")
    # duplicate ids: the md5 walk cannot order exact-id ties, so the
    # selection would be shuffle-order dependent — refused loudly
    with pytest.raises(ValueError, match="unique"):
        pps_systematic_sample(
            spark.createDataFrame(
                [(5, 100), (5, 900)], "doc_id long, w long"
            ), 1, "w", "doc_id",
        ).collect()


def test_proportional_stratified_sample_invariants(spark):
    """Exactly total_k rows out; per-stratum quotas equal the Hamilton
    apportionment computed in pure Python (floor share + largest
    remainders, ties by stratum asc); within-stratum picks follow the
    md5 exact_k order; the selection is partition-independent; NULL
    key/stratum rows are excluded; total_k > N and total_k < 1 refuse."""
    import hashlib
    from collections import Counter

    import pytest

    from pydi_spark.llmdata import proportional_stratified_sample

    sizes = {"a": 3, "b": 10, "c": 37, "d": 150}
    data, nxt = [], 0
    for s, c in sorted(sizes.items()):
        data += [(nxt + i, s) for i in range(c)]
        nxt += c
    df = spark.createDataFrame(data, "doc_id long, lang string")
    K, N = 23, len(data)

    out = proportional_stratified_sample(df, K, "doc_id", "lang").collect()
    assert len(out) == K

    fl = {s: K * c // N for s, c in sizes.items()}
    rem = {s: K * c % N for s, c in sizes.items()}
    order = sorted(sizes, key=lambda s: (-rem[s], s))
    topup = K - sum(fl.values())
    quota = {s: fl[s] + (1 if order.index(s) < topup else 0) for s in sizes}
    got = Counter(r["lang"] for r in out)
    assert dict(got) == {s: q for s, q in quota.items() if q > 0}
    assert all(r["quota"] == quota[r["lang"]] for r in out)
    # every stratum within 1 of its exact proportional share
    assert all(abs(quota[s] - K * sizes[s] / N) < 1 for s in sizes)

    # within-stratum picks replay the md5 exact_k rule
    for s in sizes:
        ids = [i for i, t in data if t == s]
        pick = sorted(
            ids,
            key=lambda i: (
                hashlib.md5(str(i).encode()).hexdigest()[:12],
                str(i),
            ),
        )[: quota[s]]
        assert sorted(r["doc_id"] for r in out if r["lang"] == s) == sorted(
            pick
        )

    o2 = proportional_stratified_sample(
        df.repartition(17), K, "doc_id", "lang"
    ).collect()
    assert sorted((r["doc_id"], r["lang"]) for r in o2) == sorted(
        (r["doc_id"], r["lang"]) for r in out
    )

    # NULL key/stratum rows are excluded from counts and selection
    withnull = df.unionByName(
        spark.createDataFrame(
            [(None, "a"), (999, None)], "doc_id long, lang string"
        )
    )
    o3 = proportional_stratified_sample(withnull, K, "doc_id", "lang")
    assert sorted(
        (r["doc_id"], r["lang"]) for r in o3.collect()
    ) == sorted((r["doc_id"], r["lang"]) for r in out)

    with pytest.raises(ValueError, match="exceeds the corpus"):
        proportional_stratified_sample(df, N + 1, "doc_id", "lang")
    with pytest.raises(ValueError, match="total_k must"):
        proportional_stratified_sample(df, 0, "doc_id", "lang")


def test_encoding_quality_report_signals(spark):
    """Synthetic damage: replacement chars, C1 controls, mojibake
    digraphs, C0 controls (tab/newline exempt) — counted exactly, and
    the same regex subset counts identically in DuckDB (the oracle's
    engine), verified row-by-row."""
    import duckdb
    import pandas as pd

    from pydi_spark.llmdata import encoding_quality_report
    from pydi_spark.llmdata.textstats import MOJIBAKE_DIGRAPHS

    rows = [
        (1, "clean prose with nothing wrong"),
        (2, "broken \ufffd twice \ufffd here"),
        (3, "caf\u00c3\u00a9 and \u00c3\u00a9clair mojibake"),
        (4, "c1 control \u0085 inside"),
        (5, "bell \u0007 and null-ish \u0001"),
        (6, "tabs\tand\nnewlines are fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in encoding_quality_report(df).collect()}
    assert out[1]["enc_flag"] == 0
    assert out[2]["n_replacement"] == 2 and out[2]["enc_flag"] == 1
    assert out[3]["n_mojibake"] == 2 and out[3]["enc_flag"] == 1
    assert out[4]["n_c1"] == 1 and out[4]["enc_flag"] == 1
    assert out[5]["n_ctrl"] == 2 and out[5]["enc_flag"] == 1
    assert out[6]["enc_flag"] == 0 and out[6]["n_ctrl"] == 0

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    moji = "|".join(MOJIBAKE_DIGRAPHS)
    odf = con.sql(
        "SELECT doc_id,"
        " CAST(length(regexp_extract_all(text, '\ufffd')) AS BIGINT) AS a,"
        " CAST(length(regexp_extract_all(text, '[\\x80-\\x9f]')) AS BIGINT) AS b,"
        f" CAST(length(regexp_extract_all(text, '{moji}')) AS BIGINT) AS c,"
        " CAST(length(regexp_extract_all(text,"
        " '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS BIGINT) AS d"
        " FROM t ORDER BY doc_id"
    ).df()
    for i, r in odf.iterrows():
        s = out[r["doc_id"]]
        assert (r["a"], r["b"], r["c"], r["d"]) == (
            s["n_replacement"], s["n_c1"], s["n_mojibake"], s["n_ctrl"]
        ), r["doc_id"]


def test_pareto_front_matches_brute_force(spark):
    """pareto_front == the quadratic dominance check on seeded random
    point sets with heavy x/y ties (integer grid — exercises the
    tie-group and duplicate-point rules); null rows are dropped; the
    distributed prefix-max path handles a frontier spanning partition
    boundaries."""
    import random

    from pydi_spark.llmdata import pareto_front

    rnd = random.Random(7)
    for _ in range(4):
        n = rnd.randint(1, 60)
        rows = [
            (i, rnd.randint(0, 6), float(rnd.randint(0, 6)))
            for i in range(n)
        ]

        def dominated(a):
            return any(
                b[1] >= a[1] and b[2] >= a[2]
                and (b[1] > a[1] or b[2] > a[2])
                for b in rows
            )

        expect = sorted(r for r in rows if not dominated(r))
        df = spark.createDataFrame(rows, "id long, x int, y double")
        got = sorted(tuple(r) for r in pareto_front(df, "x", "y").collect())
        assert got == expect

    df = spark.createDataFrame(
        [(1, None, 2.0), (2, 3, None), (3, 1, 1.0)],
        "id long, x int, y double",
    )
    assert [tuple(r) for r in pareto_front(df, "x", "y").collect()] == [
        (3, 1, 1.0)
    ]


def test_corpus_minhash_similarity_python_replay(spark):
    """Engine lanes == a pure-Python replay of the Carter-Wegman
    construction on a tiny corpus; sources with identical vocabularies
    but different documents agree on every lane (duplicate-insensitive
    min), and each pair's agreement count matches the replay exactly."""
    import hashlib
    import re

    from pydi_spark.llmdata import corpus_minhash_similarity
    from pydi_spark.llmdata.dedup import MINHASH_AB, MINHASH_PRIME

    docs = [
        ("a", "red fox jumps"),
        ("a", "red dog"),
        ("b", "red fox sleeps"),
        ("c", "red fox jumps red dog dog"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r.group_a, r.group_b): (r.agreeing_lanes, r.est_jaccard)
        for r in corpus_minhash_similarity(df, "text", "source", 16).collect()
    }

    def lanes(texts):
        vocab = set()
        for t in texts:
            vocab |= {w for w in re.split(r"[^0-9a-z#']+", t.lower()) if w}
        out = []
        for a, b in MINHASH_AB[:16]:
            best = None
            for tok in vocab:
                h60 = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                h31 = (h60 >> 28) % MINHASH_PRIME
                v = (a * h31 + b) % MINHASH_PRIME
                best = v if best is None or v < best else best
            out.append(best)
        return out

    sig = {
        g: lanes([t for s, t in docs if s == g]) for g in ("a", "b", "c")
    }
    expect = {}
    for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
        agree = sum(1 for i in range(16) if sig[x][i] == sig[y][i])
        expect[(x, y)] = (agree, round(agree / 16.0, 6))
    assert got == expect
    # a and c share a vocabulary (duplicates and multiplicity ignored)
    assert got[("a", "c")] == (16, 1.0)
