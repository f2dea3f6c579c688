"""Extraction + profiling + streaming extensions."""

import pytest
from pyspark.sql import functions as F

from pydi_spark.extraction import (
    CodeExtractor,
    ExtractorPipeline,
    InformationExtractionEvaluator,
    RegexExtractor,
    RuleDiscovery,
)
from pydi_spark.profiling import DataProfiler


@pytest.fixture(scope="module")
def product_docs(spark):
    rows = [
        ("d1", "Laptop with 16 GB RAM, 2.4 GHz CPU for $1,299.00 — see https://shop.example.com/a"),
        ("d2", "Phone, 128 GB storage, price €599. Contact sales@example.com"),
        ("d3", "Monitor 27 inch, 60 W power draw, 75 Hz refresh"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_regex_extractor(product_docs):
    ex = RegexExtractor(
        {
            "price": {"source_column": "text",
                      "patterns": [r"[$€£]\s?([0-9][0-9,.]*)"],
                      "postprocess": lambda c: F.regexp_replace(c, ",", "").try_cast("double")},
            "storage_gb": {"source_column": "text",
                           "pattern": r"(?i)([0-9.]+\s*(?:tb|gb|mb))",
                           "postprocess": "parse_storage_gb"},
            "email": {"source_column": "text",
                      "pattern": r"([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})"},
        }
    )
    out = {r["doc_id"]: r for r in ex.extract(product_docs).collect()}
    assert out["d1"]["price"] == 1299.0
    assert out["d1"]["storage_gb"] == 16.0
    assert out["d2"]["email"] == "sales@example.com"
    assert out["d3"]["price"] is None


def test_code_extractor_and_pipeline(product_docs):
    code = CodeExtractor(
        {
            "n_words": {"function": lambda v: len(str(v).split()),
                        "source_column": "text"},
            "combo": {"function": lambda row: f"{row['doc_id']}:{len(row['text'])}",
                      "row_based": True, "columns": ["doc_id", "text"]},
        }
    )
    regex = RegexExtractor(
        {"freq": {"source_column": "text", "pattern": r"(?i)([0-9.]+\s*hz)",
                  "postprocess": "parse_frequency_hz"}}
    )
    out = {r["doc_id"]: r for r in
           ExtractorPipeline([regex, code]).run(product_docs).collect()}
    assert out["d3"]["freq"] == 75.0
    assert int(out["d1"]["n_words"]) > 5
    assert out["d2"]["combo"].startswith("d2:")


def test_rule_discovery(product_docs):
    extracted, coverage = RuleDiscovery(coverage_threshold=0.5).extract_and_select(
        product_docs, "text"
    )
    assert coverage["x_number"] == 1.0
    assert "x_number" in extracted.columns
    assert "x_date_iso" not in extracted.columns  # no dates present


def test_ie_evaluator(spark):
    pred = spark.createDataFrame(
        [("1", "100", "x"), ("2", None, "y"), ("3", "7", "z")],
        "id string, price string, name string",
    )
    gold = spark.createDataFrame(
        [("1", "100", "x"), ("2", "5", "y"), ("3", "8", "z")],
        "id string, price string, name string",
    )
    m = InformationExtractionEvaluator().evaluate(pred, gold, "id")
    assert m["per_attribute"]["price"]["tp"] == 1
    assert m["per_attribute"]["price"]["fn"] == 1
    assert m["per_attribute"]["price"]["fp"] == 1
    assert m["per_attribute"]["name"]["f1"] == 1.0
    assert m["micro"]["precision"] == pytest.approx(4 / 5)


def test_profiler(spark, sf_dir, tmp_path):
    from pydi_spark.io import load_parquet

    ds = load_parquet(spark, f"{sf_dir}/customer.parquet", "customer")
    prof = DataProfiler().profile(ds, out_dir=str(tmp_path))
    assert prof["rows"] == 150
    assert prof["columns"]["c_acctbal"]["median"] is not None
    assert prof["columns"]["c_mktsegment"]["top_values"]
    # histogram: 10 equi-width buckets partitioning all non-null values
    hist = prof["columns"]["c_acctbal"]["histogram"]
    assert len(hist["counts"]) == 10 and len(hist["edges"]) == 11
    assert sum(hist["counts"]) == prof["columns"]["c_acctbal"]["non_null"]
    assert hist["edges"][0] == prof["columns"]["c_acctbal"]["min"]
    assert (tmp_path / "customer_profile.html").exists()

    cmp = DataProfiler().compare(ds, ds)
    assert cmp["only_a"] == [] and cmp["shared_columns"]


def test_profiler_html_report(spark, tmp_path):
    """Per-column report sections on movies-shaped fixtures (the repo's
    stand-in for PyDI's ydata/sweetviz HTML, profiler.py:30-106)."""
    from pydi_spark.core.dataset import Dataset

    movies = Dataset.wrap(
        spark.createDataFrame(
            [
                ("m1", "The Matrix", 1999, 8.7, "scifi"),
                ("m2", "Heat", 1995, 8.3, "crime"),
                ("m3", "Blade Runner", 1982, 8.1, "scifi"),
                ("m4", "Alien", 1979, None, "scifi"),
                ("m5", "Casablanca", 1942, 8.5, None),
            ],
            "id string, title string, year int, rating double, genre string",
        ),
        "movies", id_column="id",
    )
    prof = DataProfiler().profile(movies, out_dir=str(tmp_path))
    html = (tmp_path / "movies_profile.html").read_text()
    for c in prof["columns"]:
        assert f"col_{c}" in html  # a section per column
    assert "<svg" in html  # numeric histograms rendered
    assert prof["columns"]["rating"]["histogram"]["counts"]
    assert sum(prof["columns"]["year"]["histogram"]["counts"]) == 5
    assert prof["columns"]["genre"]["top_values"]  # distinct-count table
    assert "~distinct" in html


def test_streaming_ops(spark, sf_dir):
    from pydi_spark.io.readers import nanos_to_timestamp
    from pydi_spark.streaming import streaming_dedup, windowed_event_counts
    from pydi_spark.streaming.dedup import run_stream_from_parquet

    path = f"{sf_dir}/events.parquet"
    batch = nanos_to_timestamp(spark.read.parquet(path))

    # batch/stream parity: the same plan on the batch frame is the oracle
    expected_dedup = batch.dropDuplicates(["user_id", "event_type"]).count()
    got = run_stream_from_parquet(
        spark, path,
        lambda s: streaming_dedup(nanos_to_timestamp(s), ["user_id", "event_type"]),
        output_mode="append", query_name="dedup_result",
    )
    assert got.count() == expected_dedup

    expected_counts = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(batch, "6 hours").collect()
    }
    got2 = run_stream_from_parquet(
        spark, path,
        lambda s: windowed_event_counts(nanos_to_timestamp(s), "6 hours"),
        output_mode="complete", query_name="window_result",
    )
    got_counts = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in got2.collect()
    }
    assert got_counts == expected_counts


def test_streaming_distinct_users(spark, sf_dir):
    """Batch mode = exact countDistinct (the oracle's side); the SAME
    call on a stream auto-switches to watermarked HLL and stays within
    its documented relative error; exact=True on a stream raises (no
    silent approximation flip)."""
    from pydi_spark.io.readers import nanos_to_timestamp
    from pydi_spark.streaming import windowed_distinct_users
    from pydi_spark.streaming.dedup import run_stream_from_parquet

    path = f"{sf_dir}/events.parquet"
    batch = nanos_to_timestamp(spark.read.parquet(path))
    exact = {
        r["window_start"]: r["n_users"]
        for r in windowed_distinct_users(batch, "6 hours").collect()
    }
    assert exact and max(exact.values()) > 1
    got = run_stream_from_parquet(
        spark, path,
        lambda s: windowed_distinct_users(nanos_to_timestamp(s), "6 hours"),
        output_mode="complete", query_name="distinct_users_result",
    )
    approx = {r["window_start"]: r["n_users"] for r in got.collect()}
    assert set(approx) == set(exact)
    for w, n in exact.items():
        assert abs(approx[w] - n) <= max(2, int(0.15 * n)), (w, n, approx[w])

    import pytest as _pytest

    with _pytest.raises(Exception):
        run_stream_from_parquet(
            spark, path,
            lambda s: windowed_distinct_users(
                nanos_to_timestamp(s), "6 hours", exact=True
            ),
            output_mode="complete", query_name="distinct_exact_should_fail",
        )


def test_hll_sketches_merge(spark, sf_dir):
    from pydi_spark.profiling.sketches import hll_distinct, merge_hll_sketches

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    half1 = cust.where("c_custkey < 75")
    half2 = cust.where("c_custkey >= 75")
    s1 = hll_distinct(half1, ["c_custkey", "c_mktsegment"])
    s2 = hll_distinct(half2, ["c_custkey", "c_mktsegment"])
    merged = {r["column_name"]: r["approx_distinct"]
              for r in merge_hll_sketches(s1, s2).collect()}
    # HLL error at lg_k=12 is ~1%; exact: 150 keys, 5 segments
    assert abs(merged["c_custkey"] - 150) <= 5
    assert merged["c_mktsegment"] == 5


def test_kll_quantiles(spark, sf_dir):
    from pydi_spark.profiling.sketches import kll_quantiles

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = {r["quantile"]: r["value"] for r in
           kll_quantiles(cust, "c_acctbal", [0.5]).collect()}
    exact = cust.approxQuantile("c_acctbal", [0.5], 0.0)[0]
    assert abs(got[0.5] - exact) / exact < 0.1


def test_stateful_dedup_ttl(spark, sf_dir):
    import pytest

    from pydi_spark.streaming.dedup import run_stream_from_parquet, stateful_dedup_ttl

    path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(path)
    expected_users = {r["user_id"] for r in batch.select("user_id").distinct().collect()}
    got = run_stream_from_parquet(
        spark, path,
        lambda s: stateful_dedup_ttl(s, ["user_id"]),
        output_mode="append", query_name="ttl_dedup_result",
    )
    rows = got.collect()
    assert len(rows) == len(expected_users)          # exactly one row per key
    assert {r["user_id"] for r in rows} == expected_users
    # streaming-only guard
    with pytest.raises(ValueError):
        stateful_dedup_ttl(batch, ["user_id"])


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Drive BOTH sides of the interval join as real file streams
    (availableNow) and assert exact parity with the batch plan — the
    unified-semantics contract the oracle relies on."""
    import os
    import tempfile

    from pydi_spark.io.readers import nanos_to_timestamp
    from pydi_spark.streaming import stream_stream_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    ev = nanos_to_timestamp(spark.read.parquet(path))
    batch = stream_stream_join(
        ev.where("event_type = 'click'"), ev.where("event_type = 'purchase'")
    )
    expected = {tuple(map(str, r)) for r in batch.collect()}
    assert expected, "fixture should produce at least one joined pair"

    schema = spark.read.parquet(path).schema
    with tempfile.TemporaryDirectory() as staged:
        os.symlink(os.path.abspath(path), os.path.join(staged, "events.parquet"))

        def src():
            raw = spark.readStream.schema(schema).parquet(staged)
            return nanos_to_timestamp(raw)

        out = stream_stream_join(
            src().where("event_type = 'click'"),
            src().where("event_type = 'purchase'"),
        )
        assert out.isStreaming
        with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt:
            q = (
                out.writeStream.format("memory")
                .queryName("ssj_parity")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .outputMode("append")
                .start()
            )
            q.awaitTermination(120)
        got = {tuple(map(str, r))
               for r in spark.sql("SELECT * FROM ssj_parity").collect()}
    assert got == expected


def test_streaming_incremental_dedup(spark, tmp_path):
    """foreachBatch ingest dedup: decisions land per batch, kept docs'
    signatures append to the store, later batches see them. Assertions
    are order-robust (file->trigger order is not contractual): the
    dedup INVARIANT is one representative per duplicate class."""
    from pydi_spark.llmdata import minhash_signature_table
    from pydi_spark.streaming import streaming_incremental_dedup

    base_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    other = "one two three four five six seven eight nine ten eleven"
    store_docs = spark.createDataFrame(
        [(1, base_text)], "doc_id long, text string"
    )
    store_path = str(tmp_path / "store")
    minhash_signature_table(store_docs, num_hashes=8).write.parquet(store_path)

    src = tmp_path / "incoming"
    spark.createDataFrame(
        [(100, other), (101, base_text)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(
        [(200, other), (201, "unique zulu yankee xray whiskey victor")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b1"))

    schema = spark.read.parquet(str(src / "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    decisions_path = str(tmp_path / "decisions")
    q = streaming_incremental_dedup(
        spark, stream, store_path, decisions_path,
        num_hashes=8, bands=4, jaccard_threshold=0.7,
    )
    q.awaitTermination()

    out = {r["id"]: r for r in spark.read.parquet(decisions_path).collect()}
    assert set(out) == {"100", "101", "200", "201"}
    # 101 duplicates the seeded store doc — always matched
    assert out["101"]["matched_store"] == 1
    # exactly ONE of the identical pair {100, 200} is kept overall
    kept_dupes = [i for i in ("100", "200")
                  if out[i]["kept"] == 1]
    assert len(kept_dupes) == 1
    assert out["201"]["kept"] == 1
    # the store grew by exactly the kept rows
    store_ids = {r["id"] for r in spark.read.parquet(store_path).select("id").collect()}
    expected = {"1"} | {i for i in out if out[i]["kept"] == 1}
    assert store_ids == expected


def test_heavy_hitters_sketch(spark):
    from pydi_spark.profiling.sketches import heavy_hitters_sketch

    rows = (["hot"] * 500 + ["warm"] * 120 + ["mild"] * 60
            + [f"tail{i}" for i in range(300)])
    df = spark.createDataFrame([(v,) for v in rows], "k string").repartition(4)
    out = heavy_hitters_sketch(df, "k", k=16, top_n=3).collect()
    got = {r["key"]: r for r in out}
    # the three true heavy keys survive and rank correctly
    assert [r["key"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "hot", "warm", "mild"]
    # MG bound: est <= true <= est + undercount
    for key, true in (("hot", 500), ("warm", 120), ("mild", 60)):
        r = got[key]
        assert r["est_count"] <= true <= r["est_count"] + r["max_undercount"]


def test_heavy_hitters_exact_regime(spark):
    """Domain cardinality <= k: no partition can ever shed a counter,
    so the sketch equals the exact counts with max_undercount == 0
    under ANY partitioning — the property the profile_heavy_hitters
    oracle row (r11) rests on."""
    from pydi_spark.profiling.sketches import heavy_hitters_sketch

    rows = [(f"k{i % 7}",) for i in range(400)]
    expected = {f"k{i}": 400 // 7 + (1 if i < 400 % 7 else 0) for i in range(7)}
    base = spark.createDataFrame(rows, "k string")
    for n_part in (1, 3, 32):
        out = heavy_hitters_sketch(
            base.repartition(n_part), "k", k=8, top_n=7
        ).collect()
        assert {r["key"]: r["est_count"] for r in out} == expected
        assert all(r["max_undercount"] == 0 for r in out)


def test_batch_stream_sessionize_parity(spark, sf_dir):
    """The lag-based batch sessionizer and session_window agree on the
    session partitioning (boundary semantics differ only at an exact
    30:00.000000 gap, which real micros timestamps never hit)."""
    import __spark_entry__ as entry

    batch = entry.q_events_sessionize_batch(spark, sf_dir)
    sw = entry.q_streaming_sessionize(spark, sf_dir)  # batch plan of session_window
    a = sorted((r["user_id"], r["n_events"]) for r in batch.collect())
    b = sorted((r["user_id"], r["n_events"]) for r in sw.collect())
    assert a == b


def test_streaming_incremental_dedup_restart(spark, tmp_path):
    """Checkpointed restart: a second run with the same checkpoint
    processes only files that arrived after the first run — each doc
    gets exactly one decision row across restarts."""
    from pydi_spark.llmdata import minhash_signature_table
    from pydi_spark.streaming import (
        compact_signature_store,
        streaming_incremental_dedup,
    )

    store_docs = spark.createDataFrame(
        [(1, "seed words alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    store_path = str(tmp_path / "store")
    minhash_signature_table(store_docs, num_hashes=8).write.parquet(store_path)
    src = tmp_path / "in"
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(10, "first batch unique doc one two three")], schema
    ).coalesce(1).write.parquet(str(src / "b0"))
    dec_path = str(tmp_path / "dec")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = streaming_incremental_dedup(
            spark, stream, store_path, dec_path,
            num_hashes=8, bands=4, jaccard_threshold=0.7,
        )
        q.awaitTermination()

    run()
    # second file lands AFTER the first run finished; restart resumes
    spark.createDataFrame(
        [(20, "second batch other words four five six")], schema
    ).coalesce(1).write.parquet(str(src / "b1"))
    run()

    dec = spark.read.parquet(dec_path)
    ids = [r["id"] for r in dec.select("id").collect()]
    assert sorted(ids) == ["10", "20"]  # exactly once each
    # both kept -> store grew to 3; compaction is idempotent
    n = compact_signature_store(spark, store_path)
    assert n == 3
    assert spark.read.parquet(store_path).count() == 3


def test_streaming_incremental_dedup_crash_replay(spark, tmp_path):
    """Simulate the crash window: the batch's signature append LANDED
    but the checkpoint did not commit. The replayed trigger must
    produce the same decisions (self-exclusion hides the landed rows)
    and must not duplicate store rows."""
    from pydi_spark.llmdata import minhash_signature_table
    from pydi_spark.streaming import streaming_incremental_dedup

    schema = "doc_id long, text string"
    seed = spark.createDataFrame(
        [(1, "seed alpha beta gamma delta epsilon zeta")], schema
    )
    batch = spark.createDataFrame(
        [(10, "fresh words one two three four"),
         (11, "seed alpha beta gamma delta epsilon zeta")], schema
    )
    src = tmp_path / "in"
    batch.coalesce(1).write.parquet(str(src / "b0"))

    def run(store_path, dec_path):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = streaming_incremental_dedup(
            spark, stream, store_path, dec_path,
            num_hashes=8, bands=4, jaccard_threshold=0.7,
        )
        q.awaitTermination()

    # clean reference run
    clean_store = str(tmp_path / "store_clean")
    minhash_signature_table(seed, num_hashes=8).write.parquet(clean_store)
    run(clean_store, str(tmp_path / "dec_clean"))
    ref = {(r["id"], r["matched_store"], r["kept"])
           for r in spark.read.parquet(str(tmp_path / "dec_clean")).collect()}

    # crash-window run: store already holds the batch's kept signatures
    crash_store = str(tmp_path / "store_crash")
    minhash_signature_table(seed, num_hashes=8).write.parquet(crash_store)
    minhash_signature_table(
        batch.where("doc_id = 10"), num_hashes=8
    ).write.mode("append").parquet(crash_store)  # the landed append
    run(crash_store, str(tmp_path / "dec_crash"))
    got = {(r["id"], r["matched_store"], r["kept"])
           for r in spark.read.parquet(str(tmp_path / "dec_crash")).collect()}
    assert got == ref  # identical decisions despite the landed append
    # no duplicate store rows
    ids = [r["id"] for r in spark.read.parquet(crash_store).select("id").collect()]
    assert sorted(ids) == sorted(set(ids))


def test_streaming_incremental_dedup_cold_start(spark, tmp_path):
    """First-ever run with NO pre-seeded signature store: the batch
    handler must treat the missing path as an empty store instead of
    failing inside foreachBatch (round-4 ADVICE)."""
    from pydi_spark.streaming import streaming_incremental_dedup

    schema = "doc_id long, text string"
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "cold start first doc alpha beta gamma"),
         (2, "cold start first doc alpha beta gamma")],
        schema,
    ).coalesce(1).write.parquet(str(src / "b0"))
    store_path = str(tmp_path / "store")  # does not exist yet
    dec_path = str(tmp_path / "dec")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = streaming_incremental_dedup(
        spark, stream, store_path, dec_path,
        num_hashes=8, bands=4, jaccard_threshold=0.7,
    )
    q.awaitTermination()
    out = {r["id"]: r for r in spark.read.parquet(dec_path).collect()}
    assert set(out) == {"1", "2"}
    # in-batch pair deduped; min id kept; store was created with 1 row
    assert out["1"]["kept"] == 1 and out["2"]["kept"] == 0
    assert spark.read.parquet(store_path).count() == 1


def test_streaming_health_snapshot(spark, tmp_path):
    """streaming_health condenses StreamingQueryProgress into the
    ingest-alarm metrics (input rows, watermark, state footprint)."""
    from pydi_spark.io.readers import nanos_to_timestamp
    from pydi_spark.streaming import streaming_health, windowed_event_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "ev"
    rows = [(i, 1000000000000 + i * 60_000_000_000) for i in range(50)]
    spark.createDataFrame(rows, "user_id long, ts long").coalesce(1)\
        .write.parquet(str(src / "b0"))
    schema = spark.read.parquet(str(src / "b0")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    events = nanos_to_timestamp(stream, "ts")
    agg = windowed_event_counts(
        events, window_duration="10 minutes", watermark="5 minutes",
        key_column=None, value_column=None,
    )
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("health_probe")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    h = streaming_health(q)
    assert h["batches"] >= 1
    assert h["input_rows"] == 50
    assert h["watermark"] is not None
    assert h["dropped_late_rows"] == 0
    assert isinstance(h["behind"], bool)
    q.stop()


def test_compact_signature_store_recovers_interrupted_swap(spark, tmp_path):
    """Round-5 ADVICE: a crash between os.rename(base, backup) and
    os.rename(staging, base) leaves base missing — the next invocation
    must restore the backup BEFORE clearing staging/backup, not delete
    the only surviving copies."""
    import os
    import shutil

    from pydi_spark.streaming import compact_signature_store

    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "id string, sig string"
    )
    df.write.parquet(store)
    # simulate the crash window: base renamed away, staging half-written
    os.rename(store, store + "_old")
    os.makedirs(store + "_compacting")
    with open(os.path.join(store + "_compacting", "junk"), "w") as f:
        f.write("partial")
    n = compact_signature_store(spark, store)
    assert n == 2
    assert spark.read.parquet(store).count() == 2
    assert not os.path.exists(store + "_old")
    assert not os.path.exists(store + "_compacting")
    shutil.rmtree(store, ignore_errors=True)


def test_count_min_sketch_properties(spark):
    """CMS one-sided error (est >= true for EVERY key), exactness at
    collision-free width, and the merge law (sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)))."""
    import pyspark.sql.functions as F

    from pydi_spark.profiling import (
        cms_estimate,
        count_min_sketch,
        merge_cms_sketches,
    )

    rows = [(f"k{i % 37}",) for i in range(500)] + [("hot",)] * 91
    df = spark.createDataFrame(rows, "k string")
    truth = {r["k"]: r["c"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}

    # tight width forces collisions -> still never undercounts
    sk = count_min_sketch(df, "k", width=16, depth=3)
    est = {r["key"]: r["est"]
           for r in cms_estimate(sk, df, "k", width=16, depth=3).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    # generous width: no collisions among 38 keys -> exact
    skw = count_min_sketch(df, "k", width=1 << 14, depth=4)
    estw = {r["key"]: r["est"]
            for r in cms_estimate(skw, df, "k", width=1 << 14, depth=4).collect()}
    assert estw == truth
    # merge law: per-half sketches sum to the whole corpus's sketch
    h1 = df.where(F.substring(F.md5("k"), 1, 1).isin(*"01234567"))
    h2 = df.where(~F.substring(F.md5("k"), 1, 1).isin(*"01234567"))
    merged = merge_cms_sketches(
        count_min_sketch(h1, "k", width=64, depth=3),
        count_min_sketch(h2, "k", width=64, depth=3),
    )
    whole = count_min_sketch(df, "k", width=64, depth=3)
    a = {(r["d"], r["w"]): r["cnt"] for r in merged.collect()}
    b = {(r["d"], r["w"]): r["cnt"] for r in whole.collect()}
    assert a == b
    # totality on empty input
    empty = spark.createDataFrame([], "k string")
    assert count_min_sketch(empty, "k").count() == 0
    assert cms_estimate(whole, empty, "k").count() == 0


# --------------------------------------------------- dependency discovery

def test_discover_fds(spark):
    from pydi_spark.profiling import discover_fds

    df = spark.createDataFrame(
        [
            (1, "a", "x"), (2, "a", "x"), (3, "b", "y"),
            (4, "b", "z"),          # b maps to two cities -> dept !-> city
            (5, None, "x"),         # null determinant rows are ignored
            (6, "c", None),         # null dependent rows are ignored
        ],
        "id int, dept string, city string",
    )
    got = {
        (r["determinant"], r["dependent"]): (r["n_det"], r["n_pair"], r["holds"])
        for r in discover_fds(df, ["id", "dept", "city"]).collect()
    }
    assert got[("id", "dept")][2] == 1       # key determines everything
    assert got[("id", "city")][2] == 1
    assert got[("dept", "city")] == (2, 3, 0)  # b -> {y, z}
    # pairs reversed -> (x,a),(y,b),(z,b): city -> dept HOLDS
    assert got[("city", "dept")] == (3, 3, 1)


def test_discover_inds(spark):
    from pydi_spark.profiling import discover_inds

    a = spark.createDataFrame([(1,), (2,), (3,), (None,)], "v int")
    b = spark.createDataFrame([("1",), ("2",), ("3",), ("4",)], "w string")
    got = {
        (r["lhs"], r["rhs"]): (r["n_lhs_values"], r["n_missing"], r["holds"])
        for r in discover_inds(
            [(a, "v", b, "w"), (b, "w", a, "v")],
            names=[("a.v", "b.w"), ("b.w", "a.v")],
        ).collect()
    }
    # ints compare as strings; nulls ignored
    assert got[("a.v", "b.w")] == (3, 0, 1)
    assert got[("b.w", "a.v")] == (4, 1, 0)


def test_dependencies_validation(spark):
    import pytest as _pytest

    from pydi_spark.profiling import discover_fds, discover_inds

    df = spark.createDataFrame([(1,)], "a int")
    with _pytest.raises(ValueError):
        discover_fds(df, ["a"])
    with _pytest.raises(ValueError):
        discover_inds([])


def test_discover_keys(spark):
    from pydi_spark.profiling import discover_keys

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "x")],
        "id int, g string, h string",
    )
    got = {r["columns"]: (r["n_distinct"], r["is_key"])
           for r in discover_keys(df, ["id", "g", "h"], max_size=2).collect()}
    assert got["id"] == (4, 1)
    assert got["g"] == (2, 0)
    assert got["g,h"] == (3, 0)        # (b,x) repeats
    assert got["id,g"] == (4, 1)
    # nulls compare equal (UCC convention): two all-null rows collide
    df2 = spark.createDataFrame([(None,), (None,)], "v string")
    got2 = discover_keys(df2, ["v"], max_size=1).collect()[0]
    assert (got2["n_distinct"], got2["n_rows"], got2["is_key"]) == (1, 2, 0)


# ----------------------------------------------------- cross-column stats

def test_correlation_matrix_known_values(spark):
    from pydi_spark.profiling import correlation_matrix

    rows = [(float(i), 2.0 * i, 10.0 - i, 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["x", "y", "z", "c"])
    out = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr_micro"])
        for r in correlation_matrix(df, ["x", "y", "z", "c"], scale=2).collect()
    }
    assert len(out) == 6
    assert out[("x", "y")][0] == 20
    assert abs(out[("x", "y")][1] - 1_000_000) <= 1   # perfectly correlated
    assert abs(out[("x", "z")][1] + 1_000_000) <= 1   # anti-correlated
    # zero-variance side -> null
    assert out[("c", "x")][1] is None


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from pydi_spark.profiling import correlation_matrix

    rng = np.random.default_rng(11)
    a = np.round(rng.normal(50, 10, 300), 2)
    b = np.round(a * 0.5 + rng.normal(0, 5, 300), 2)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], ["a", "b"]
    )
    got = correlation_matrix(df, ["a", "b"], scale=2).collect()[0]
    want = np.corrcoef(a, b)[0, 1]
    assert abs(got["corr_micro"] / 1e6 - want) < 1e-4


def test_correlation_matrix_listwise_deletion_and_validation(spark):
    import pytest as _pytest

    from pydi_spark.profiling import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, None), (None, 4.0)], ["a", "b"]
    )
    got = correlation_matrix(df, ["a", "b"], scale=2).collect()[0]
    assert got["n"] == 2
    with _pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


def test_categorical_dispersion(spark):
    from pydi_spark.profiling import categorical_dispersion

    df = spark.createDataFrame(
        [("a", "k", None), ("a", "l", None), ("a", "m", None), ("a", "n", "x")],
        ["const", "uniq", "mostly_null"],
    )
    out = {
        r["column"]: (r["n_rows"], r["n_distinct"], r["gini_micro"])
        for r in categorical_dispersion(
            df, ["const", "uniq", "mostly_null"]
        ).collect()
    }
    assert out["const"] == (4, 1, 0)
    # 4 unique of 4: 1 - 4*(1/16) = 0.75
    assert out["uniq"] == (4, 4, 750_000)
    # null is a value: counts {None:3, x:1} -> 1 - (9+1)/16 = 0.375
    assert out["mostly_null"] == (4, 2, 375_000)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        categorical_dispersion(df, [])


def test_exact_quantiles_known_values(spark):
    from pydi_spark.profiling import exact_quantiles

    df = spark.createDataFrame(
        [(float(v), v) for v in range(1, 11)] + [(None, 99)], ["x", "y"]
    )
    out = {r["column"]: r for r in exact_quantiles(df, ["x", "y"]).collect()}
    # x: 10 non-null values 1..10 -> p25 = ceil(2.5)=3rd, p50 = 5th,
    # p75 = ceil(7.5)=8th (percentile_disc picks elements, no interp)
    assert out["x"]["n"] == 10
    assert (out["x"]["p_250000"], out["x"]["p_500000"],
            out["x"]["p_750000"]) == (3.0, 5.0, 8.0)
    assert out["y"]["n"] == 11
    assert out["y"]["p_500000"] == 6  # 6th of 11 sorted (1..10, 99)


def test_exact_quantiles_duplicates_and_extremes(spark):
    from pydi_spark.profiling import exact_quantiles

    df = spark.createDataFrame([(1,)] * 7 + [(9,)] * 3, ["v"])
    out = exact_quantiles(df, ["v"], ps=(0.5, 0.7, 0.71, 1.0)).collect()[0]
    assert out["p_500000"] == 1
    assert out["p_700000"] == 1      # rank 7 is still the last 1
    assert out["p_710000"] == 9      # rank ceil(7.1)=8 crosses into 9s
    assert out["p_1000000"] == 9     # max
    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_quantiles(df, [])
    with _pytest.raises(ValueError):
        exact_quantiles(df, ["v"], ps=(0.0,))


def test_join_cardinality_report(spark):
    from pydi_spark.profiling import join_cardinality_report

    L = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), (None,)], ["k"]
    )
    R = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("d",), (None,)], ["j"]
    )
    r = join_cardinality_report(L, R, "k", "j").collect()[0]
    assert r["n_left"] == 4 and r["n_right"] == 5         # null keys out
    assert r["n_left_keys"] == 3 and r["n_right_keys"] == 3
    assert r["n_matching_keys"] == 2
    assert r["join_rows"] == 2 * 3 + 1 * 1                # exact inner size
    assert r["max_key_fanout"] == 6
    assert r["left_rows_unmatched"] == 1                  # c
    assert r["right_rows_unmatched"] == 1                 # d
    # cross-check against the actual join
    assert L.join(R, L.k == R.j).count() == r["join_rows"]


def test_detect_anomalies_mad(spark):
    from pydi_spark.profiling import detect_anomalies

    rows = [("a", i, 100) for i in range(9)] + [
        ("a", 9, 100_000),            # the outlier
        ("b", 0, 5), ("b", 1, 7), ("b", 2, 9),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {(r["k"], r["t"]): (r["median"], r["mad"], r["is_anomaly"])
           for r in detect_anomalies(df, ["k"], "v").collect()}
    # a: median 100, MAD 0 -> only the spike deviates
    assert got[("a", 9)] == (100, 0, 1)
    assert got[("a", 0)] == (100, 0, 0)
    # b: median 7, MAD 2, |5-7|=2 <= 3*2 -> clean
    assert got[("b", 0)] == (7, 2, 0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        detect_anomalies(df, ["k"], "v", k_num=0)


def test_grouped_lower_median_matches_impute(spark):
    from pydi_spark.profiling import grouped_lower_median

    df = spark.createDataFrame(
        [("g", v) for v in (5, 1, 3, 9)] + [("h", 2)], ["k", "v"]
    )
    got = {r["k"]: r["median"]
           for r in grouped_lower_median(df, ["k"], "v").collect()}
    assert got == {"g": 3, "h": 2}   # lower median of 4 values


def test_detect_anomalies_keeps_all_null_groups(spark):
    """Review fix: a key group whose values are entirely null has no
    median, but its rows must survive with is_anomaly=0."""
    from pydi_spark.profiling import detect_anomalies

    df = spark.createDataFrame(
        [("k1", 0, None), ("k1", 1, None), ("k2", 0, 5)],
        "k string, t int, v int",
    )
    got = detect_anomalies(df, ["k"], "v").collect()
    assert len(got) == 3
    assert all(r["is_anomaly"] == 0 for r in got)


def test_null_pattern_report(spark):
    from pydi_spark.profiling import null_pattern_report

    df = spark.createDataFrame(
        [(1, "x", 5.0), (None, None, 6.0), (None, None, None), (2, "y", None)],
        "a int, b string, c double",
    )
    got = {r["pattern"]: (r["null_cols"], r["n"], r["share_ppm"])
           for r in null_pattern_report(df, ["a", "b", "c"]).collect()}
    assert got[0] == ("", 1, 250_000)
    assert got[3] == ("a,b", 1, 250_000)      # a+b null together
    assert got[7] == ("a,b,c", 1, 250_000)
    assert got[4] == ("c", 1, 250_000)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        null_pattern_report(df, [])


def test_benford_profile(spark):
    """Known distribution: digits of [1, 12, -13, 145, 2, 0, None] for
    column a -> d1:3 d2:1 (zeros/nulls excluded); all 9 digits present
    zero-filled; shares exact ppm; expected = the Benford literals."""
    import pytest as _pytest

    from pydi_spark.profiling import BENFORD_EXPECTED_PPM, benford_profile

    df = spark.createDataFrame(
        [(1, 9), (12, 9), (-13, 91), (145, 9), (2, 9), (0, 9), (None, 9)],
        "a long, b long",
    )
    out = benford_profile(df, ["a", "b"])
    rows = {(r["column"], r["digit"]): r for r in out.collect()}
    assert len(rows) == 18  # 9 digits x 2 columns, zero-filled
    # digits: 1->1, 12->1, -13->1, 145->1, 2->2 ; zeros/nulls dropped
    got_a = {d: rows[("a", d)]["n"] for d in range(1, 10)}
    assert got_a == {1: 4, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0}
    assert rows[("a", 1)]["share_ppm"] == 4 * 1_000_000 // 5
    assert rows[("a", 2)]["share_ppm"] == 1_000_000 // 5
    got_b = {d: rows[("b", d)]["n"] for d in range(1, 10)}
    assert got_b[9] == 7  # 9,9,91,9,9,9,9 -> all first-digit 9
    assert rows[("b", 9)]["share_ppm"] == 1_000_000
    for d in range(1, 10):
        assert rows[("a", d)]["expected_ppm"] == BENFORD_EXPECTED_PPM[d]
    with _pytest.raises(ValueError):
        benford_profile(df, [])


def test_streaming_sliding_parity(spark, sf_dir):
    """Sliding windows (slide < duration) on a real stream: every event
    lands in exactly duration/slide windows, and the streaming run
    matches the batch plan (the oracle's side) window-for-window."""
    from pydi_spark.io.readers import nanos_to_timestamp
    from pydi_spark.streaming import windowed_event_counts
    from pydi_spark.streaming.dedup import run_stream_from_parquet

    path = f"{sf_dir}/events.parquet"
    batch = nanos_to_timestamp(spark.read.parquet(path)).where(
        "ts IS NOT NULL"
    )
    b = windowed_event_counts(batch, "6 hours", slide="2 hours",
                              value_column=None)
    expected = {(r["window_start"], r["event_type"]): r["n_events"]
                for r in b.collect()}
    # fan-out law: total windowed events = 3x the raw events
    assert sum(expected.values()) == 3 * batch.count()
    got = run_stream_from_parquet(
        spark, path,
        lambda s: windowed_event_counts(
            nanos_to_timestamp(s).where("ts IS NOT NULL"),
            "6 hours", slide="2 hours", value_column=None),
        output_mode="complete", query_name="sliding_result",
    )
    got_counts = {(r["window_start"], r["event_type"]): r["n_events"]
                  for r in got.collect()}
    assert got_counts == expected


def test_category_drift_report(spark):
    """Exact drift accounting: one-sided values survive the full outer
    with n=0; NULL is a real category; shares are exact integer ppm and
    delta is their signed difference."""
    from pydi_spark.profiling import category_drift_report

    a = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], "c string")
    b = spark.createDataFrame(
        [("x",), ("z",), ("z",), ("z",)], "c string")
    got = {r["value"]: r for r in category_drift_report(a, b, "c").collect()}
    assert set(got) == {"x", "y", "z", None}
    assert (got["x"]["n_a"], got["x"]["n_b"]) == (2, 1)
    assert got["x"]["share_a_ppm"] == 500000 and got["x"]["share_b_ppm"] == 250000
    assert got["x"]["delta_ppm"] == -250000
    assert (got["y"]["n_b"], got["y"]["share_b_ppm"]) == (0, 0)
    assert got["z"]["share_b_ppm"] == 750000 and got["z"]["n_a"] == 0
    assert got[None]["n_a"] == 1 and got[None]["n_b"] == 0
    # the lazy form triggers no Spark job at call time: assert via the
    # status tracker (a wall-clock bound flaked under host contention)
    sc = spark.sparkContext
    group = "drift-lazy-probe"
    sc.setJobGroup(group, "category_drift_report must not run jobs")
    try:
        category_drift_report(a, b, "c")
        assert sc.statusTracker().getJobIdsForGroup(group) == []
    finally:
        sc.setJobGroup(None, None)


def test_numeric_drift_report(spark):
    """Uniform baseline 1..100 split into 4 equi-depth bins (edges
    25/50/75 by percentile_disc); a shifted batch 81..180 puts ALL its
    mass past the last edge. Values equal to an edge land in the LOWER
    bin; empty/degenerate baselines refuse."""
    import pytest as _pytest

    from pydi_spark.profiling import numeric_drift_report

    a = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(81, 181)], "v double")
    rows = {r["bin"]: r for r in numeric_drift_report(a, b, "v", n_bins=4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert [rows[i]["n_a"] for i in range(4)] == [25, 25, 25, 25]
    assert [rows[i]["share_a_ppm"] for i in range(4)] == [250000] * 4
    assert [rows[i]["n_b"] for i in range(4)] == [0, 0, 0, 100]
    assert rows[3]["share_b_ppm"] == 1000000
    assert rows[3]["delta_ppm"] == 750000
    assert rows[0]["delta_ppm"] == -250000
    # enclosing edges: open first/last bins, exact column elements
    assert rows[0]["lo"] is None and rows[0]["hi"] == 25.0
    assert rows[1]["lo"] == 25.0 and rows[1]["hi"] == 50.0
    assert rows[3]["lo"] == 75.0 and rows[3]["hi"] is None
    # edge-equal values land LOW: 25.0 is in bin 0
    one = spark.createDataFrame([(25.0,)], "v double")
    got = {r["bin"]: r["n_b"] for r in
           numeric_drift_report(a, one, "v", n_bins=4).collect()}
    assert got[0] == 1 and got[1] == 0
    # refusals
    empty = spark.createDataFrame([], "v double")
    with _pytest.raises(ValueError, match="no non-null"):
        numeric_drift_report(empty, b, "v", n_bins=4)
    with _pytest.raises(ValueError, match="n_bins"):
        numeric_drift_report(a, b, "v", n_bins=1)
    # NULLs excluded from both sides
    withnull = spark.createDataFrame(
        [(None,), (10.0,)], "v double")
    got2 = {r["bin"]: r["n_b"] for r in
            numeric_drift_report(a, withnull, "v", n_bins=4).collect()}
    assert sum(got2.values()) == 1


def test_value_runs_gaps_and_islands(spark):
    import pytest as _pytest

    from pydi_spark.profiling import value_runs

    rows = [
        ("k1", 1, "a"), ("k1", 2, "a"), ("k1", 3, "b"),
        ("k1", 4, "a"), ("k1", 5, None), ("k1", 6, None),
        ("k2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, o int, v string")
    out = sorted(
        ((r["k"], r["value"], r["run_start"], r["run_end"], r["run_len"])
         for r in value_runs(df, ["k"], "o", "v").collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert out == [
        ("k1", "a", 1, 2, 2),
        ("k1", "b", 3, 3, 1),
        ("k1", "a", 4, 4, 1),      # re-appearance = NEW run
        ("k1", None, 5, 6, 2),     # consecutive NULLs form one run
        ("k2", "x", 1, 1, 1),
    ]
    # partition independence
    out13 = sorted(
        ((r["k"], r["value"], r["run_start"], r["run_end"], r["run_len"])
         for r in value_runs(df.repartition(13), ["k"], "o", "v").collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert out13 == out
    with _pytest.raises(ValueError, match="key_cols"):
        value_runs(df, [], "o", "v")


def test_changepoint_report_localizes_shift(spark):
    import pytest as _pytest

    from pydi_spark.profiling import changepoint_report

    # k1: rate jumps 1 -> 9 at t=6 of 10; k2: perfectly steady;
    # k3: zero total mass -> dropped
    rows = (
        [("k1", t, 1.0) for t in range(1, 6)]
        + [("k1", t, 9.0) for t in range(6, 11)]
        + [("k2", t, 4.0) for t in range(1, 11)]
        + [("k3", t, 0.0) for t in range(1, 4)]
    )
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {r["k"]: r.asDict() for r in
           changepoint_report(df, ["k"], "t", "v").collect()}
    assert set(out) == {"k1", "k2"}
    # the maximal divergence sits at the last low-rate step (t=5):
    # cum share 5/50 = 100000 ppm vs index share 5/10 = 500000 ppm
    assert out["k1"]["split_idx"] == 5 and out["k1"]["split_ord"] == 5
    assert out["k1"]["stat_ppm"] == 400_000
    # steady series: every prefix share equals the index share
    assert out["k2"]["stat_ppm"] == 0 and out["k2"]["split_idx"] == 1
    # partition independence
    out13 = {r["k"]: r["split_idx"] for r in changepoint_report(
        df.repartition(13), ["k"], "t", "v").collect()}
    assert out13 == {k: d["split_idx"] for k, d in out.items()}
    with _pytest.raises(ValueError, match="key_cols"):
        changepoint_report(df, [], "t", "v")


def test_gini_concentration_known_values(spark):
    from pydi_spark.profiling import gini_concentration

    # perfectly equal -> 0
    eq = spark.createDataFrame([(1, 5.0)] * 4, "id int, v double")
    row = gini_concentration(eq, "v").collect()[0]
    assert row["gini_ppm"] == 0 and row["n"] == 4
    assert row["total_micro"] == 20_000_000
    # one owner of everything among n=4: G = (n-1)/n = 0.75
    one = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0), (4, 8.0)], "id int, v double"
    )
    assert gini_concentration(one, "v").collect()[0]["gini_ppm"] == 750_000
    # hand-worked: values 1,2,3,4 -> G = 2*30-5*10 over 4*10 = 0.25
    lin = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 5)], "id int, v double"
    )
    assert gini_concentration(lin, "v").collect()[0]["gini_ppm"] == 250_000
    # empty / all-null / single row -> 0, never an error
    empty = spark.createDataFrame([], "id int, v double")
    assert gini_concentration(empty, "v").collect()[0]["gini_ppm"] == 0
    single = spark.createDataFrame([(1, 3.0)], "id int, v double")
    assert gini_concentration(single, "v").collect()[0]["gini_ppm"] == 0
    # partition independence (ties under arbitrary rank order)
    tie = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(60)], "id int, v double"
    )
    a = gini_concentration(tie, "v").collect()[0]["gini_ppm"]
    b = gini_concentration(tie.repartition(17), "v").collect()[0]["gini_ppm"]
    assert a == b


def test_new_users_curve(spark):
    import datetime as dt

    from pydi_spark.events import new_users_curve

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0), ("u1", t0 + dt.timedelta(days=3)),      # returns: not new
        ("u2", t0),
        ("u3", t0 + dt.timedelta(days=2)),
        ("u4", t0 + dt.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = sorted(
        ((r["day"], r["n_new"], r["n_cumulative"])
         for r in new_users_curve(df).collect())
    )
    d0 = out[0][0]
    assert [(d - d0, nn, nc) for d, nn, nc in out] == [
        (0, 2, 2), (1, 0, 2), (2, 1, 3), (3, 1, 4),
    ]


def test_lorenz_curve_hand_computed(spark):
    """Values 1..10 in 5 buckets: sums 3/7/11/15/19, cumulative ppm =
    floor(cum*1e6/55). Negative values and n_buckets < 2 are refused;
    an all-equal column reads exactly k/n_buckets per row."""
    import pytest

    from pydi_spark.profiling import lorenz_curve

    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    got = {
        r["bucket"]: (r["n"], r["bucket_micro"], r["cum_value_ppm"])
        for r in lorenz_curve(df, "v", n_buckets=5).collect()
    }
    exp, cum = {}, 0
    for b, s in enumerate([3, 7, 11, 15, 19], start=1):
        cum += s
        exp[b] = (2, s * 1_000_000, cum * 1_000_000 // 55)
    assert got == exp
    # perfect equality: cumulative shares are the diagonal (ties
    # straddle every boundary; sums must not care about tie order)
    eq = spark.createDataFrame([(2.0,)] * 10, "v double")
    diag = {
        r["bucket"]: r["cum_value_ppm"]
        for r in lorenz_curve(eq, "v", n_buckets=5).collect()
    }
    assert diag == {b: b * 1_000_000 // 5 for b in range(1, 6)}
    with pytest.raises(ValueError, match="negative"):
        lorenz_curve(
            spark.createDataFrame([(-1.0,)], "v double"), "v"
        ).collect()
    with pytest.raises(ValueError, match="n_buckets"):
        lorenz_curve(df, "v", n_buckets=1)
