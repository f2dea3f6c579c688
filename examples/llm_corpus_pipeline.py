"""End-to-end LLM training-corpus pipeline on the synthetic documents.

The composition a pretraining data team runs, stage by stage, each one a
distributed operator from pydi_spark.llmdata:

  load -> corpus diagnostics (Zipf head, cross-source contamination
       matrix) -> language ID -> quality gate (Gopher rules) -> corpus
       line dedup (C4 rule) -> MinHash near-dup canonicalization
       -> decontaminate vs eval -> LM quality scoring + DSIR-style
       importance -> quality-weighted sampling -> temperature source
       balancing -> token-budget mixing -> greedy sequence packing
       -> summary

    python3 examples/llm_corpus_pipeline.py [sf_dir]

Every stage is lazy; the single count at the end executes one fused
plan per materialization point. At cluster scale the same code runs
unchanged — the operators shuffle hashes/ids, never document bytes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.llmdata import (  # noqa: E402
    canonical_corpus,
    cross_source_overlap,
    decontaminate,
    dedup_corpus_lines,
    dsir_scores,
    language_id,
    minhash_near_duplicates,
    pack_sequences,
    quality_filter,
    quality_weighted_sample,
    select_token_budget,
    temperature_mix,
    unigram_lm_scores,
    zipf_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. corpus diagnostics a data team reads BEFORE filtering: the
    # Zipf head (is the token distribution sane / is one boilerplate
    # string dominating?) and the cross-source contamination matrix
    # (is source X scraping source Y?)
    print("-- Zipf head (top 5 tokens)")
    zipf_table(docs, top=5).show(5, truncate=False)
    print("-- most-overlapping source pairs")
    cross_source_overlap(docs, n=2).orderBy(F.desc("jaccard")).show(3)

    # 0b. script routing BEFORE language ID: language markers only work
    # within a writing system — a multilingual crawl routes latin docs
    # to langid and everything else to per-script handling
    from pydi_spark.llmdata import script_profile

    scripts = script_profile(docs)
    print("-- dominant scripts")
    scripts.groupBy("dominant_script").count().show(5)
    docs = docs.join(
        scripts.where("dominant_script = 'latin'").select("doc_id"),
        "doc_id", "left_semi",
    )

    # 1. language ID (native n-gram heuristic) — keep confident rows
    langs = language_id(docs)
    docs = docs.join(langs.select("doc_id", "predicted_lang"), "doc_id")

    # 1b. encoding-damage audit BEFORE tokenization: mojibake and
    # control-char junk survives dedup and poisons BPE merges — drop
    # flagged docs while the fix is cheap (re-fetch / re-decode)
    from pydi_spark.llmdata import encoding_quality_report

    enc = encoding_quality_report(docs)
    n_enc_damaged = enc.where("enc_flag = 1").count()
    docs = docs.join(
        enc.where("enc_flag = 0").select("doc_id"), "doc_id", "left_semi"
    )

    # 2. Gopher-style quality gate (per-rule booleans, conjunctive keep)
    gated = quality_filter(docs)
    keep_ids = gated.where("keep").select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    n_quality = docs.count()

    # 2a2. fastText-style quality classifier: train tiny logistic
    # weights on hashed buckets (reference = confident-English docs,
    # raw = the rest), then score the corpus with the exact-integer
    # margin — the distributable stage
    from pydi_spark.llmdata import (
        linear_quality_classifier,
        train_quality_classifier,
    )

    pos = docs.where(F.col("predicted_lang") == "en").limit(200)
    neg = docs.where(F.col("predicted_lang") != "en").limit(200)
    w_cls, b_cls = train_quality_classifier(pos, neg, n_buckets=128,
                                            sample_size=200, n_iter=20)
    margins = linear_quality_classifier(docs, w_cls, bias_micro=b_cls)
    n_keep = margins.where("keep = 1").count()
    print(f"quality classifier keeps {n_keep} docs "
          f"(margin >= 0 under trained weights)")

    # 2b. corpus-level exact line dedup (C4 rule: every repeated line
    # survives only at its first occurrence)
    lines = dedup_corpus_lines(docs)
    docs = (
        docs.drop("text", "n_chars")
        .join(lines.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .withColumn("n_chars", F.length("text"))
    )

    # 3+4. near-dup collapse, QUALITY-AWARE: MinHash LSH -> connected
    # components -> keep the LONGEST doc per duplicate cluster under
    # the (length DESC, id ASC) total order (keep_best_duplicates; the
    # min-id rule is canonical_corpus when ids are the right tiebreak)
    from pydi_spark.llmdata import keep_best_duplicates

    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.9)
    canon = keep_best_duplicates(
        docs.withColumn("q", F.length("text")), pairs, "q"
    )
    kept = canon.where("is_kept = 1").select("doc_id")

    # 3b. community structure of the near-dup graph: synchronous label
    # propagation keeps dense template families apart where connected
    # components would fuse everything a weak shared boilerplate line
    # chains together — the report a crawl-dedup postmortem starts from
    from pydi_spark.llmdata import label_propagation

    communities = label_propagation(pairs.select("id1", "id2"), n_iter=4)
    n_comm = communities.select("label").distinct().count()

    # ...and how GOOD is that community split? Newman-Girvan modularity
    # says whether the LPA labels carve real structure (Q >= ~0.3) or
    # random wiring (Q ~ 0) — the gate before sharding the corpus by
    # community. Degree assortativity says whether the near-dup graph
    # is hub-to-hub (template families chaining) or hub-to-leaf
    # (one boilerplate source fanning out).
    from pydi_spark.llmdata import degree_assortativity, modularity_score

    q_row = modularity_score(
        pairs.select("id1", "id2"), communities, node_col="id",
        community_col="label",
    ).collect()[0]
    assort = degree_assortativity(pairs.select("id1", "id2")).collect()[0]

    # 3c. which links is the near-dup graph MISSING? structural link
    # prediction ranks non-edge pairs that share verified neighbours —
    # a blocked-pair recovery list for the next dedup pass
    from pydi_spark.llmdata import link_prediction_scores

    predicted = link_prediction_scores(
        pairs.select("id1", "id2"), min_common=1
    )
    n_predicted = predicted.count()

    # 3d. centrality of the near-dup graph, weighted by how many band
    # collisions back each edge: heavy edges pull rank (the dedup
    # review queue reads top-rank first)
    from pydi_spark.llmdata import weighted_pagerank_micro

    weighted_edges = pairs.groupBy("id1", "id2").agg(
        F.count(F.lit(1)).alias("weight")
    )
    top_rank = (
        weighted_pagerank_micro(weighted_edges, n_iter=4)
        .orderBy(F.desc("rank_micro")).limit(3).collect()
    )

    docs = docs.join(kept, "doc_id", "left_semi")
    # cut lineage: every later stage (and its count) would otherwise
    # re-execute the dedup cascade above
    docs = docs.localCheckpoint()
    n_canon = docs.count()

    # 4b. marginal value of an incoming batch BEFORE paying full-dedup
    # cost: novelty of the newest docs' trigrams vs the standing corpus
    # (shuffle-join gram overlap — the broadcast-decontaminate dual)
    from pydi_spark.llmdata import novelty_scores

    incoming = docs.where(F.col("doc_id") % 5 == 0)
    standing = docs.where(F.col("doc_id") % 5 != 0)
    nov = novelty_scores(incoming, standing, n=3)
    print("-- incoming-batch novelty (ppm of trigrams unseen in corpus)")
    nov.agg(F.min("novelty_ppm"), F.expr("percentile_approx(novelty_ppm, 0.5)"),
            F.max("novelty_ppm")).show()

    # 5. benchmark decontamination vs a held-out eval split
    ev = docs.where(F.col("doc_id") % 47 == 0)
    train = docs.where(F.col("doc_id") % 47 != 0)
    flags = decontaminate(train, ev, n=3, threshold=0.05)
    clean_ids = flags.where(~F.col("is_contaminated")).select("doc_id")
    docs = train.join(clean_ids, "doc_id", "left_semi")
    docs = docs.localCheckpoint()
    n_clean = docs.count()

    # 5b. unigram-LM quality scoring + DSIR-style importance toward
    # the English subcorpus, combined into one sampling weight:
    # documents made of typical words AND distributed like the target
    # get proportionally higher keep rates (deterministic md5-fraction
    # decision)
    lm = unigram_lm_scores(docs)
    dsir = dsir_scores(docs, F.col("lang") == "en")
    weighted = docs.join(
        lm.select(
            "doc_id",
            (F.lit(250.0) * F.col("mean_token_freq")).alias("w"),
        ),
        "doc_id",
    ).join(
        dsir.select(
            "doc_id", (F.col("ratio_micro") / 1000000.0).alias("w_dsir")
        ),
        "doc_id",
        "left",
    ).withColumn(
        "w", F.col("w") * F.coalesce(F.col("w_dsir"), F.lit(1.0))
    )
    sampled = quality_weighted_sample(
        weighted, weight_col="w", key_col="doc_id", target_fraction=0.9
    )
    docs = docs.join(
        sampled.where("selected").select("doc_id"), "doc_id", "left_semi"
    )

    # 6. temperature-scaled source balancing (sqrt weights up-weight
    # small sources; deterministic hash keep-decision)
    balanced = temperature_mix(docs, target_fraction=0.8, alpha=0.5)
    docs = docs.join(
        balanced.where("selected").select("doc_id"), "doc_id", "left_semi"
    )

    # 7. per-source token-budget mixing (deterministic hash order)
    mixed = select_token_budget(docs, budget_tokens=800)
    docs = docs.join(mixed.where("selected").select("doc_id"), "doc_id", "left_semi")
    docs = docs.localCheckpoint()

    # 8. greedy sequence packing into 256-token context windows
    packed = pack_sequences(docs, capacity_tokens=256)
    summary = packed.groupBy("source").agg(
        F.count("*").alias("docs"),
        (F.max("bin_id") + 1).alias("bins"),
        F.sum("n_tokens").alias("tokens"),
    )

    # 9. subword vocabulary over the surviving corpus: BPE merges
    # trained on the word-frequency table (one corpus pass; training
    # iterations are vocab-sized), then segment and report the top
    # pieces — the vocabulary a tokenizer design would start from
    from pydi_spark.llmdata import bpe_segment, piece_stats, train_bpe_merges
    from pydi_spark.llmdata.bpe import word_frequencies

    merges = train_bpe_merges(docs, n_merges=10, word_filter=r"^[a-z]+$")
    wf = word_frequencies(docs, word_filter=r"^[a-z]+$")
    top_pieces = piece_stats(bpe_segment(wf, merges), top_n=15)

    # 10. route the surviving docs to weighted shards (capacity 3/2/1):
    # rendezvous hashing keeps the assignment stable if a shard server
    # is added or removed between nightly runs — only the affected
    # shard's keys move, unlike hash-mod resharding
    from pydi_spark.io import rendezvous_shard

    shard_plan = (
        rendezvous_shard(docs.select("doc_id"), "doc_id", [3, 2, 1])
        .groupBy("shard").agg(F.count("*").alias("docs"))
        .orderBy("shard")
    )

    print(f"loaded {n0} -> encoding-clean (-{n_enc_damaged}) "
          f"-> quality {n_quality} -> canonical {n_canon} "
          f"-> decontaminated {n_clean}; "
          f"{n_comm} near-dup communities "
          f"(modularity q={q_row['q']:.3f} over {q_row['m_edges']} edges, "
          f"assortativity r={assort['r']:.3f}); "
          f"{n_predicted} predicted missing links; "
          f"top weighted-pagerank docs: "
          f"{[r['id'] for r in top_rank]}")
    shard_plan.show(5, truncate=False)
    summary.orderBy("source").show(25, truncate=False)
    print(f"BPE merges: {merges}")
    top_pieces.show(15, truncate=False)


if __name__ == "__main__":
    main()
