"""Model-based stages (PLM/LLM matchers, LLM extractor, vector features,
fusion analysis, EM debug writers) with deterministic fakes."""

import pytest
from pyspark.sql import functions as F

from pydi_spark.blocking import NoBlocker
from pydi_spark.core.dataset import Dataset
from pydi_spark.matching import (
    LLMBasedMatcher,
    PLMBasedMatcher,
    TextFormatter,
    VectorFeatureExtractor,
)


@pytest.fixture(scope="module")
def pair_setup(spark):
    left = spark.createDataFrame(
        [("l1", "the matrix", "1999"), ("l2", "heat", "1995")],
        "rid string, title string, year string",
    )
    right = spark.createDataFrame(
        [("r1", "the matrix reloaded", "2003"), ("r2", "completely different", "1970")],
        "rid string, title string, year string",
    )
    pairs = NoBlocker().block(left, right, id_column="rid")
    return left, right, pairs


def test_plm_matcher_fake(spark, pair_setup):
    left, right, pairs = pair_setup
    m = PLMBasedMatcher(TextFormatter(["title"]))
    out = {(r["id1"], r["id2"]): r["score"] for r in
           m.match(left, right, pairs, threshold=0.0, id_column="rid").collect()}
    assert out[("l1", "r1")] > out[("l2", "r2")]
    assert out[("l1", "r1")] == pytest.approx(2 / 3)  # {the,matrix} / union of 3


def test_llm_matcher_fake(spark, pair_setup):
    left, right, pairs = pair_setup
    m = LLMBasedMatcher(TextFormatter(["title", "year"]))
    out = m.match(left, right, pairs, threshold=0.4, id_column="rid")
    got = {(r["id1"], r["id2"]) for r in out.collect()}
    assert ("l1", "r1") in got
    assert ("l2", "r2") not in got


def test_llm_matcher_broken_client(spark, pair_setup):
    left, right, pairs = pair_setup

    def broken_factory():
        def client(prompt):
            raise RuntimeError("api down")

        return client

    m = LLMBasedMatcher(TextFormatter(["title"]), client_factory=broken_factory)
    out = m.match(left, right, pairs, threshold=0.0, id_column="rid").collect()
    assert all(r["score"] == 0.0 and r["notes"].startswith("llm_error") for r in out)


def test_llm_extractor_fake(spark):
    from pydi_spark.extraction import LLMExtractor

    df = spark.createDataFrame(
        [("1", "name: Alice, age: 30"), ("2", "age: 44; name: Bob"), ("3", None)],
        "id string, text string",
    )
    out = {r["id"]: r for r in
           LLMExtractor(["name", "age"]).extract(df, "text").collect()}
    assert out["1"]["name"] == "Alice" and out["1"]["age"] == "30"
    assert out["2"]["name"] == "Bob"
    assert out["3"]["name"] is None


def test_vector_feature_extractor(spark, pair_setup):
    left, right, pairs = pair_setup
    fx = VectorFeatureExtractor(columns=["title"])
    out = fx.create_features(left, right, pairs, id_column="rid")
    rows = {(r["id1"], r["id2"]): r for r in out.collect()}
    assert set(out.columns) == {"id1", "id2", "dist_cosine", "dist_euclidean", "dist_manhattan"}
    # identical-ish titles are closer than disjoint ones
    assert rows[("l1", "r1")]["dist_cosine"] < rows[("l2", "r2")]["dist_cosine"]


def test_fusion_analysis_and_report(spark):
    from pydi_spark.fusion.analysis import (
        FusionReport,
        compare_dataset_schemas,
        detect_attribute_conflicts,
        suggest_fusion_rules,
    )
    from pydi_spark.fusion import DataFusionEngine

    d1 = Dataset.wrap(
        spark.createDataFrame(
            [("a1", "X", 1.0), ("a2", "Y", 2.0)], "rid string, name string, v double"
        ),
        "d1", id_column="rid",
    )
    d2 = Dataset.wrap(
        spark.createDataFrame(
            [("b1", "X2", 1.5), ("b2", "Y", 9.0)], "rid string, name string, v double"
        ),
        "d2", id_column="rid",
    )
    corr = spark.createDataFrame(
        [("a1", "b1", 1.0), ("a2", "b2", 1.0)], "id1 string, id2 string, score double"
    )
    schemas = compare_dataset_schemas([d1, d2])
    assert all(r["is_shared"] for r in schemas.collect())

    conflicts = {r["attribute"]: r["conflicting_groups"] for r in
                 detect_attribute_conflicts([d1, d2], corr).collect()}
    assert conflicts["name"] == 1  # X vs X2
    assert conflicts["v"] == 2

    rules = suggest_fusion_rules([d1, d2], corr)
    assert rules["v"] == "average"

    fused = DataFusionEngine().run([d1, d2], corr)
    summary = FusionReport(fused).summary()
    assert summary["n_groups"] == 2 and summary["n_records"] == 4


def test_em_debug_writers(spark, tmp_path):
    from pydi_spark.evaluation.matching_eval import (
        write_cluster_details,
        write_debug_results,
    )

    corr = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.7)], "id1 string, id2 string, score double"
    )
    gold = spark.createDataFrame([("a", "b", 1)], "id1 string, id2 string, label int")
    write_debug_results(corr, str(tmp_path / "debug"), gold)
    out = spark.read.option("header", True).csv(str(tmp_path / "debug"))
    assert out.count() == 2 and "gold_label" in out.columns

    write_cluster_details(corr, str(tmp_path / "clusters"))
    det = spark.read.json(str(tmp_path / "clusters"))
    row = det.collect()[0]
    assert row["n_entities"] == 3 and row["n_edges"] == 2


def test_llm_schema_matcher_fake(spark):
    from pydi_spark.schemamatching import LLMBasedSchemaMatcher

    src = Dataset.wrap(
        spark.createDataFrame(
            [("s1", "Heat", "Mann"), ("s2", "Alien", "Scott")],
            "sid string, movie string, dir string",
        ),
        "src", id_column="sid",
    )
    tgt = Dataset.wrap(
        spark.createDataFrame(
            [("t1", "Heat", "Mann"), ("t2", "Alien", "Scott")],
            "tid string, title string, director string",
        ),
        "tgt", id_column="tid",
    )
    out = LLMBasedSchemaMatcher().match(src, tgt, threshold=0.5)
    pairs = {(r["source_column"], r["target_column"]) for r in out.collect()}
    assert ("movie", "title") in pairs
    assert ("dir", "director") in pairs


def test_fusion_debug_trace(spark):
    from pydi_spark.fusion import DataFusionEngine, DataFusionStrategy
    from pydi_spark.fusion.engine import fusion_debug_long

    ds = Dataset.wrap(
        spark.createDataFrame(
            [("r1", "x"), ("r2", "y")], "rid string, a string"
        ),
        "s", id_column="rid",
    )
    corr = spark.createDataFrame([("r1", "r2", 1.0)], "id1 string, id2 string, score double")
    strat = DataFusionStrategy().add_attribute_fuser("a", "voting")
    fused = DataFusionEngine(strat).run([ds], corr, debug=True)
    assert "_conf_a" in fused.columns
    trace = fusion_debug_long(fused).collect()
    assert trace[0]["rule"] == "voting"
    assert trace[0]["attribute"] == "a"


def test_provenance_tracker(spark):
    from pydi_spark.fusion.provenance import ProvenanceTracker, extract_source_trust_scores

    d1 = Dataset.wrap(spark.createDataFrame([(1,)], "x int"), "a", trust_score=0.9)
    d2 = Dataset.wrap(spark.createDataFrame([(2,)], "x int"), "b")
    assert extract_source_trust_scores([d1, d2]) == {"a": 0.9, "b": 0.5}
    tr = ProvenanceTracker()
    tr.record("load", [], "a")
    tr.record("load", [], "b")
    tr.record_fusion([d1, d2], "fused")
    lineage = tr.lineage_of("fused")
    assert [e["op"] for e in lineage] == ["load", "load", "fusion"]


def test_openai_compatible_client_real_http(spark, pair_setup):
    """Drive LLMBasedMatcher through the stdlib-urllib OpenAI-compatible
    client against a local fake /chat/completions server — the real HTTP
    path, deterministic responses."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            prompt = body["messages"][0]["content"]
            parts = prompt.split("<record>")
            texts = [p.split("</record>")[0] for p in parts[1:]]
            a, b = set(texts[0].lower().split()), set(texts[1].lower().split())
            sim = len(a & b) / len(a | b) if (a or b) else 0.0
            content = json.dumps({"match": sim >= 0.5, "score": round(sim, 4),
                                  "explanation": "fake server"})
            out = json.dumps(
                {"choices": [{"message": {"role": "assistant", "content": content}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from pydi_spark.matching import openai_compatible_client

        left, right, pairs = pair_setup
        m = LLMBasedMatcher(
            TextFormatter(["title", "year"]),
            client_factory=openai_compatible_client(
                f"http://127.0.0.1:{port}/v1", model="fake-model"
            ),
        )
        got = {(r["id1"], r["id2"])
               for r in m.match(left, right, pairs, threshold=0.4,
                                id_column="rid").collect()}
        assert ("l1", "r1") in got
        assert ("l2", "r2") not in got
    finally:
        srv.shutdown()


def test_sentence_transformer_hooks_skip_cleanly():
    """The real-model factories import the heavy lib lazily at call time;
    constructing them must be free, and without the package the call must
    raise ImportError (pipelines fall back to the tested fakes)."""
    import pytest as _pytest

    from pydi_spark.blocking import sentence_transformer_embedder
    from pydi_spark.matching import sentence_transformer_cross_encoder

    embed = sentence_transformer_embedder()          # no import yet
    factory = sentence_transformer_cross_encoder()   # no import yet
    _pytest.importorskip("sentence_transformers")
    # only reached when the package exists: exercise the real paths
    vecs = embed(["hello world"])
    assert vecs.shape[0] == 1
    scores = factory()(["a [SEP] b"])
    assert len(scores) == 1


# ---------------------------------------------------------- call logging

def test_llm_matcher_call_log(spark, pair_setup):
    """Reference parity: LLMCallLogger capture (PyDI/utils/llm.py:88-212
    wired at entitymatching/llm_based.py:72,348). One record per call,
    previews + attempt + duration populated, matches identical to
    match()."""
    left, right, pairs = pair_setup
    m = LLMBasedMatcher(TextFormatter(["title", "year"]))
    matches, log = m.match_with_log(left, right, pairs, threshold=0.4,
                                    id_column="rid")
    plain = {(r["id1"], r["id2"]) for r in
             m.match(left, right, pairs, threshold=0.4, id_column="rid").collect()}
    assert {(r["id1"], r["id2"]) for r in matches.collect()} == plain
    rows = log.collect()
    # fake client succeeds first try: one call per candidate pair,
    # including below-threshold pairs
    assert len(rows) == pairs.count()
    for r in rows:
        assert r["stage"] == "llm_matcher"
        assert r["attempt"] == 0 and r["error"] is None
        assert "<record>" in r["prompt_preview"]
        assert '"score"' in r["response_preview"]
        assert r["duration_ms"] >= 0.0


def test_llm_matcher_call_log_usage_and_retries(spark, pair_setup):
    """A client that fails on its first call and reports usage metadata:
    the log carries BOTH attempts (error then success) and the usage
    lands in usage_json / call_log_summary."""
    import json as _json

    left, right, pairs = pair_setup

    def flaky_factory():
        state = {"calls": 0}

        def client(prompt):
            state["calls"] += 1
            if state["calls"] == 1:
                raise RuntimeError("rate limited")
            return (
                _json.dumps({"match": True, "score": 0.9, "explanation": "ok"}),
                {"input_tokens": 10, "output_tokens": 5},
            )

        return client

    m = LLMBasedMatcher(TextFormatter(["title"]), client_factory=flaky_factory)
    one_pair = pairs.where((F.col("id1") == "l1") & (F.col("id2") == "r1"))
    matches, log = m.match_with_log(left, right, one_pair, threshold=0.5,
                                    id_column="rid")
    assert matches.count() == 1
    rows = sorted(log.collect(), key=lambda r: r["attempt"])
    assert [r["attempt"] for r in rows] == [0, 1]
    assert rows[0]["error"].startswith("RuntimeError")
    assert rows[0]["response_preview"] is None
    assert rows[1]["error"] is None
    assert _json.loads(rows[1]["usage_json"]) == {
        "input_tokens": 10, "output_tokens": 5}

    from pydi_spark.core.llmcalls import call_log_summary

    s = call_log_summary(log).collect()[0]
    assert s["total_calls"] == 2 and s["n_errors"] == 1
    assert s["total_input_tokens"] == 10
    assert s["total_output_tokens"] == 5
    assert s["total_tokens"] == 15


def test_llm_extractor_call_log(spark):
    from pydi_spark.extraction import LLMExtractor

    df = spark.createDataFrame(
        [("1", "name: Alice, age: 30"), ("2", "age: 44; name: Bob"), ("3", None)],
        "id string, text string",
    )
    out, log = LLMExtractor(["name", "age"]).extract_with_log(
        df, "text", id_column="id")
    vals = {r["id"]: r for r in out.collect()}
    assert vals["1"]["name"] == "Alice" and "_llm_calls" not in out.columns
    rows = {r["id"]: r for r in log.collect()}
    # null source value makes no call -> no log row for id 3
    assert set(rows) == {"1", "2"}
    assert rows["1"]["stage"] == "llm_extractor"
    assert "name, age" in rows["1"]["prompt_preview"]
    assert "Alice" in rows["1"]["response_preview"]


def test_llm_schema_matcher_call_log(spark):
    from pydi_spark.schemamatching import LLMBasedSchemaMatcher

    src = Dataset(
        spark.createDataFrame(
            [("the matrix", "1999")], "title string, year string"),
        name="movies_a")
    tgt = Dataset(
        spark.createDataFrame(
            [("the matrix", "1999")], "name string, released string"),
        name="movies_b")
    m = LLMBasedSchemaMatcher()
    mapping, log = m.match_with_log(src, tgt, threshold=0.5)
    plain = m.match(src, tgt, threshold=0.5)
    assert sorted(map(tuple, mapping.collect())) == sorted(
        map(tuple, plain.collect()))
    rows = log.collect()
    assert len(rows) == 1
    assert rows[0]["stage"] == "llm_schema_matcher"
    assert rows[0]["source_dataset"] == "movies_a"
    assert rows[0]["target_dataset"] == "movies_b"
    assert rows[0]["error"] is None and "movies_a" in rows[0]["prompt_preview"]


def test_extractor_pipeline_artifacts(spark, tmp_path):
    """BaseExtractor artifact-writer analogue
    (PyDI/informationextraction/base.py:108-160): config.json per step
    always; llm_calls.json + llm_usage_summary.json for LLM steps."""
    import json as _json

    from pydi_spark.extraction import ExtractorPipeline, LLMExtractor, RegexExtractor

    df = spark.createDataFrame(
        [("1", "name: Alice, age: 30 zip 12345")], "id string, text string")
    pipe = ExtractorPipeline([
        RegexExtractor({"zip": {"pattern": r"(\d{5})"}}),
        LLMExtractor(["name"]),
    ])
    out = pipe.run(df, "text", artifacts_dir=str(tmp_path))
    row = out.collect()[0]
    assert row["zip"] == "12345" and row["name"] == "Alice"
    regex_dir = tmp_path / "00_RegexExtractor"
    llm_dir = tmp_path / "01_LLMExtractor"
    assert (regex_dir / "config.json").exists()
    assert not (regex_dir / "llm_calls.json").exists()
    calls = _json.loads((llm_dir / "llm_calls.json").read_text())
    assert len(calls) == 1 and calls[0]["error"] is None
    summary = _json.loads((llm_dir / "llm_usage_summary.json").read_text())
    assert summary["total_calls"] == 1 and summary["n_errors"] == 0
    cfg = _json.loads((llm_dir / "config.json").read_text())
    assert cfg["extractor_class"] == "LLMExtractor"
    assert cfg["fields"] == ["name"]
    # artifacts_dir omitted -> pure lazy chain, nothing written
    assert pipe.run(df, "text").collect()[0]["name"] == "Alice"
