"""Empirical scale-up probe: does the dedup/blocking family scale
linearly when the data grows 10x?

SCALE.md claims the band/token-join pipelines are linear in corpus
size for fixed duplicate-class sizes (no all-pairs stage anywhere).
This probe CHECKS that on this machine: it synthesizes a 10x corpus
whose copies are token-disjoint — every word in copy k is suffixed
``_k``, so each copy reproduces the 1x near-dup structure and NO pair
crosses copies. True output therefore scales exactly 10x, and a
linear operator should take ~10x the time at fixed parallelism
(less, where fixed overhead amortizes). A super-linear ratio means a
quadratic stage is hiding somewhere.

    python3 tools/scale_probe.py [sf_dir] [ops...]

Writes the synthetic tables under spark-warehouse/scale_probe/ (real
parquet scans, so Catalyst size estimates and broadcast gates behave
exactly as they would in production) and prints one JSON line:
  {"op": {"rows_1x": n, "rows_10x": n, "sec_1x": t, "sec_10x": t,
          "time_ratio": r, "row_ratio": r}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10


def synthesize(spark, src_path: str, out_path: str, id_col: str,
               text_col: str, keep_cols: list[str]) -> None:
    """Union COPIES token-disjoint clones: ids offset, every word
    suffixed with the copy index."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_path, "_SUCCESS")):
        # cache-bust on SCHEMA drift: a scratch table synthesized by an
        # older probe version may lack newly-kept columns (r8: a stale
        # customer10 without c_nationkey broke the graph probe)
        want = {id_col, text_col, *keep_cols}
        if want <= set(spark.read.parquet(out_path).columns):
            return
    base = spark.read.parquet(src_path)
    parts = []
    for k in range(COPIES):
        parts.append(
            base.select(
                (F.col(id_col) + F.lit(k * 10_000_000)).alias(id_col),
                # suffix must survive the word tokenizer as ONE token:
                # '_' is a split character under [^\p{L}\p{N}#']+, so
                # use a letter run + the copy digit ("hash" -> "hashzq3")
                F.regexp_replace(
                    F.col(text_col), r"(\w+)", "$1zq" + str(k)
                ).alias(text_col),
                *keep_cols,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(out_path)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F

    from pydi_spark import get_spark
    from pydi_spark.blocking.token import TokenBlocker
    from pydi_spark.clustering.connected_components import (
        connected_components,
    )
    from pydi_spark.llmdata.bloom import bloom_prefilter_dedup
    from pydi_spark.llmdata.dedup import (
        exact_duplicates,
        incremental_minhash_dedup,
        minhash_near_duplicates,
        minhash_signature_table,
        ngram_jaccard_duplicates,
        simhash_near_duplicates,
    )
    from pydi_spark.llmdata.similarity import ivf_topk

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", "scale_probe",
        os.path.basename(os.path.normpath(sf_dir)),  # key cache by SF
    )
    docs10 = os.path.join(scratch, "documents10.parquet")
    part10 = os.path.join(scratch, "part10.parquet")
    emb10 = os.path.join(scratch, "embeddings10.parquet")
    cust10 = os.path.join(scratch, "customer10.parquet")
    synthesize(spark, f"{sf_dir}/documents.parquet", docs10,
               "doc_id", "text", ["source"])
    synthesize(spark, f"{sf_dir}/part.parquet", part10,
               "p_partkey", "p_name", [])
    synthesize(spark, f"{sf_dir}/customer.parquet", cust10,
               "c_custkey", "c_name", ["c_nationkey"])
    if not os.path.exists(os.path.join(emb10, "_SUCCESS")):
        # 10x embeddings: ids offset, vectors shifted by a copy-dependent
        # per-element nudge so copies are distinct but identically
        # distributed
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        parts = []
        for k in range(COPIES):
            parts.append(e.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (i % 7 - 3).cast("float") * F.lit(0.01 * k),
                ).alias("embedding"),
                "label",
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(emb10)

    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs10_df = spark.read.parquet(docs10)
    part1 = spark.read.parquet(f"{sf_dir}/part.parquet")
    part10_df = spark.read.parquet(part10)
    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb10_df = spark.read.parquet(emb10)

    def tok_block(df):
        return TokenBlocker(column="p_name").block(
            df.select(F.col("p_partkey").alias("_id"), "p_name"),
            None, id_column="_id",
        )

    def cc_over_simhash(df):
        # composed measure: simhash edge generation + the CC rounds
        # (rows = components, so row_ratio tracks cluster structure,
        # not work volume — read the time ratio against simhash's)
        edges = simhash_near_duplicates(df).select(
            F.col("id1"), F.col("id2")
        ).localCheckpoint(eager=True)
        return connected_components(edges)

    def ivf(df):
        # fixed 200-query batch against a 1x vs 10x corpus: output is
        # constant (200*k rows) by design; time ratio is the metric
        q = df.limit(200).localCheckpoint(eager=True)
        return ivf_topk(df, q, k=10, nprobe=3)

    # fixed-size batch (from the 1x corpus, present verbatim in copy 0
    # of the 10x corpus) probed against a 1x vs 10x STORE: the
    # incremental shapes' claim is that cost tracks the store pass, so
    # the time ratio should sit at/below the store's 10x (output is
    # batch-sized and constant — read the time ratio only)
    fixed_batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 5 = 0")
        .localCheckpoint(eager=True)
    )

    def incr(df):
        store = minhash_signature_table(
            df.where("doc_id % 5 != 0"), num_hashes=8
        ).localCheckpoint(eager=True)
        return incremental_minhash_dedup(
            fixed_batch, store, num_hashes=8, bands=4, jaccard_threshold=0.7
        )

    def bloom(df):
        return bloom_prefilter_dedup(
            fixed_batch, df.where("doc_id % 5 != 0"),
            key_col="text", id_col="doc_id",
        )

    # 10x events: user_id and event_id offset per copy -> users are
    # DISJOINT across copies, so per-user structure (touches per
    # conversion, user-days) reproduces exactly and true output scales
    # 10x for attribution / stays day-bounded for active_users
    events10 = os.path.join(scratch, "events10.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pydi_spark.io.readers import nanos_to_timestamp

    ev1 = nanos_to_timestamp(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("event_id", "user_id", "event_type", "ts", "value")
    if os.path.exists(os.path.join(events10, "_SUCCESS")) and (
        "value" not in spark.read.parquet(events10).columns
    ):
        # schema-bust: r9 probes (rfm) need the value column
        import shutil

        shutil.rmtree(events10)
    if not os.path.exists(os.path.join(events10, "_SUCCESS")):
        parts = [
            ev1.select(
                (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
                "event_type", "ts", "value",
            )
            for k in range(COPIES)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(events10)
    ev10 = spark.read.parquet(events10)

    def attribution(df):
        from pydi_spark.events import attribute_conversions

        return attribute_conversions(
            df, touch_types=["click", "view"], conversion_type="purchase",
            model="linear", lookback_hours=24,
        )

    def active(df):
        # output is the DAY GRID (constant across 1x/10x — same corpus
        # span); the claim under test is cost ~ |user-days| x w, so the
        # time ratio should sit at/below the 10x user-day growth
        from pydi_spark.events import active_users

        return active_users(df.select("user_id", "ts"), window_days=7)

    def ring_edges(cust):
        from pyspark.sql import Window

        w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        r = cust.select("c_custkey", "c_nationkey").withColumn(
            "rk", F.row_number().over(w)
        )
        a, b = r.alias("a"), r.alias("b")
        return a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("b.rk") - F.col("a.rk")).isin(1, 2),
        ).select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
        )

    def triangles(cust):
        # rank-chain edges: 10x customers per nation -> 10x edges and
        # ~10x triangles; the oriented wedge join's out-degree stays
        # bounded (<= 2 after orientation), so time should track edges
        # linearly. Output is ONE row (the count) — read the time ratio.
        from pydi_spark.llmdata import triangle_count

        edges = ring_edges(cust).localCheckpoint(eager=True)
        return triangle_count(edges)

    def edit_capped(df):
        # hot-gram cap (VERDICT r6 #4): a FIXED absolute cap bounds
        # every posting list by a constant, so candidate volume is
        # <= (kq+1) * n * cap — LINEAR in corpus size where the
        # uncapped join on digit-heavy Customer# names grows with the
        # posting-list squares (~76M candidates at sf0.1 1x already).
        # Recall at 10x drops (hotter grams get dropped) — the same
        # documented trade as TokenBlocker's max_token_frequency.
        from pydi_spark.functions.joins import edit_distance_join

        return edit_distance_join(
            df, None, "c_name", max_distance=1, id_column="c_custkey",
            max_gram_frequency=100,
        )

    # Synthetic PNG corpus for the multimodal family (VERDICT r7 #6:
    # perceptual_hash / image_near_duplicates / decode were pytest-only
    # and perf-untracked). Images are generated DISTRIBUTED (mapInPandas
    # over an id range, numpy seeded per cluster): clusters of 3 near-dup
    # variants (1-pixel perturbations -> hamming <= 6), cluster seeds
    # disjoint across the 1x/10x corpora's copies, so true pair output
    # scales 10x and no pair crosses copies.
    def synth_images(path: str, n_clusters: int) -> None:
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        from pyspark.sql.types import (
            BinaryType, StringType, StructField, StructType,
        )

        schema = StructType([
            StructField("media_id", StringType()),
            StructField("payload", BinaryType()),
        ])

        def gen(batches):
            import numpy as np
            import pandas as pd

            from pydi_spark.llmdata.multimodal import png_encode

            for pdf in batches:
                ids, payloads = [], []
                for cid in pdf["id"]:
                    rng = np.random.default_rng(int(cid))
                    base = (rng.random((32, 32, 3)) * 255).astype("uint8")
                    for v in range(3):
                        img = base.copy()
                        if v:  # variant: flip v pixels
                            img[0, :v] = 255 - img[0, :v]
                        ids.append(f"{cid}-{v}")
                        payloads.append(bytearray(png_encode(img)))
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

        spark.range(n_clusters).repartition(32).mapInPandas(
            gen, schema
        ).write.mode("overwrite").parquet(path)

    img1_path = os.path.join(scratch, "images1.parquet")
    img10_path = os.path.join(scratch, "images10.parquet")
    synth_images(img1_path, 500)
    synth_images(img10_path, 5000)
    img1 = spark.read.parquet(img1_path)
    img10 = spark.read.parquet(img10_path)

    def image_decode(df):
        from pydi_spark.llmdata.multimodal import decode_and_resize

        return decode_and_resize(df, 16, 16).where("decode_ok = 'ok'")

    def image_near_dups(df):
        from pydi_spark.llmdata.multimodal import image_near_duplicates

        return image_near_duplicates(df, max_hamming=6)

    def keep_best(df):
        # the r8 CC-class heavy: simhash pairs -> ids-only CC -> min_by
        # struct keep; the corpus is only touched by two narrow id
        # joins, so time should track the simhash+CC pair (row_ratio
        # ~10 — every doc emits a verdict row)
        from pydi_spark.llmdata import (
            keep_best_duplicates, simhash_near_duplicates,
        )

        d = df.select("doc_id", "text", F.length("text").alias("q"))
        pairs = simhash_near_duplicates(d, max_hamming=3, bands=4)
        return keep_best_duplicates(d, pairs, "q")

    def bcubed(df):
        # the other r8 CC-class heavy: pred = simhash canonical
        # clusters, gold = exact-text partition; the metric itself is
        # O(#cells) over the cell table, so time should track the
        # cluster construction. Output is ONE row — read the time ratio.
        from pydi_spark.evaluation import bcubed_metrics
        from pydi_spark.llmdata import simhash_near_duplicates
        from pydi_spark.llmdata.dedup import canonical_corpus

        pairs = simhash_near_duplicates(df, max_hamming=3, bands=4)
        pred = canonical_corpus(df, pairs).select(
            F.col("doc_id").cast("string").alias("record_id"),
            F.col("canonical_id").alias("cluster_id"),
        )
        gold = df.select(
            F.col("doc_id").cast("string").alias("record_id"),
            F.md5(F.col("text").cast("binary")).alias("cluster_id"),
        )
        return bcubed_metrics(pred, gold)

    def rfm(df):
        # per-user aggregate collapses the 10x stream to 10x users;
        # the three distributed global ranks are narrow shuffles of
        # that compact frame — time should track users ~linearly
        from pydi_spark.events import rfm_segments

        return rfm_segments(df)

    def cooccur(df):
        # baskets = (user, day): disjoint users -> 10x baskets, same
        # item alphabet; the distinct-presence self-join fans out per
        # basket (bounded by the alphabet), so time ~ baskets
        from pydi_spark.events import event_cooccurrence

        b = df.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            "event_type",
        )
        return event_cooccurrence(b, ["user_id", "day"], "event_type")

    def interval_overlap(df):
        # per-key density is CONSTANT (by = custkey div 10 -> ~5
        # intervals/side/key in every copy), so true output and join
        # fan-out scale 10x with the key count
        from pydi_spark.functions.joins import interval_overlap_join

        a = df.where(F.col("c_custkey") % 2 == 0).select(
            (F.col("c_custkey") / F.lit(10)).cast("long").alias("k"),
            F.col("c_custkey").alias("aid"),
            ((F.col("c_custkey") * 7) % 10000).alias("s"),
            ((F.col("c_custkey") * 7) % 10000
             + F.col("c_custkey") % 13).alias("e"),
        )
        b = df.where(F.col("c_custkey") % 2 == 1).select(
            (F.col("c_custkey") / F.lit(10)).cast("long").alias("k"),
            F.col("c_custkey").alias("bid"),
            ((F.col("c_custkey") * 11) % 10000).alias("s"),
            ((F.col("c_custkey") * 11) % 10000
             + F.col("c_custkey") % 17).alias("e"),
        )
        return interval_overlap_join(
            a, b, ("s", "e"), ("s", "e"), by="k", bucket_width=16
        )

    def link_pred(cust):
        # rank-chain edges (degree <= 4): wedge volume is linear in
        # nodes, so candidate pairs and time should both scale ~10x
        from pydi_spark.llmdata import link_prediction_scores

        edges = ring_edges(cust).localCheckpoint(eager=True)
        return link_prediction_scores(edges)

    def hits(cust):
        # directed rank-chain edges: 10x nodes -> 10x edges; HITS is
        # n_iter x (two co-partitioned edge⋈score joins + two
        # map-side-combined aggregates), so time should track edges
        # near-linearly (VERDICT r9 #4)
        from pydi_spark.llmdata.graph import hits_micro

        edges = ring_edges(cust).selectExpr(
            "id1 AS src", "id2 AS dst"
        ).localCheckpoint(eager=True)
        return hits_micro(edges, n_iter=4)

    def pr_weighted(cust):
        # deterministic integer weights; same one-join-per-round core
        # as pagerank_micro with weight-proportional shares
        from pydi_spark.llmdata.graph import weighted_pagerank_micro

        edges = ring_edges(cust).withColumn(
            "weight", (F.col("id1") % 5 + 1).cast("long")
        ).localCheckpoint(eager=True)
        return weighted_pagerank_micro(edges, n_iter=5)

    def bfs(cust):
        # seeds = every 100th customer, radius 3 over the rank-chain:
        # seed count and frontier volume both scale ~10x with nodes,
        # so reached-row counts AND time should track ~10x
        from pydi_spark.llmdata.graph import bfs_hops

        edges = ring_edges(cust).localCheckpoint(eager=True)
        seeds = cust.where(F.col("c_custkey") % 100 == 0).select(
            F.col("c_custkey").alias("id")
        )
        return bfs_hops(edges, seeds, max_hops=3)

    def modularity(cust):
        # one-row audit: ring edges + nation communities; linear in |E|
        from pydi_spark.llmdata import modularity_score

        edges = ring_edges(cust).localCheckpoint(eager=True)
        comm = cust.select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").cast("string").alias("community"),
        )
        return modularity_score(edges, comm)

    def bots(df):
        # user-disjoint copies: 10x users -> 10x report rows; one
        # exchange by user feeds both window passes
        from pydi_spark.events import bot_report

        return bot_report(df, min_events=10, max_median_gap_ms=3_600_000)

    def lorenz(cust):
        # distributed rank + bucket aggregate over 10x values; fixed
        # 10-row output — read the time ratio (derived value: the
        # synthetic customer10 carries only key/name/nation columns)
        from pydi_spark.profiling import lorenz_curve

        vals = cust.select(
            ((F.col("c_custkey") * 13) % 10000).cast("double").alias("v")
        )
        return lorenz_curve(vals, "v", n_buckets=10)

    def pps(df):
        # fixed k=50 selection points over a 10x corpus: output stays
        # sample-sized; the running-sum walk is the linear part
        from pydi_spark.llmdata import pps_systematic_sample

        docs = df.select(
            "doc_id", (F.length("text") + F.lit(1)).cast("long").alias("w")
        )
        return pps_systematic_sample(docs, 50, "w", "doc_id")

    ops = {
        "dedup_exact": lambda df: exact_duplicates(df),
        "dedup_minhash": lambda df: minhash_near_duplicates(df),
        "dedup_simhash": lambda df: simhash_near_duplicates(df),
        "dedup_ngram": lambda df: ngram_jaccard_duplicates(df),
        "blocking_token": tok_block,
        "cluster_cc": cc_over_simhash,
        "ann_ivf": ivf,
        "dedup_incremental": incr,
        "dedup_bloom": bloom,
        "join_edit_capped": edit_capped,
        "events_attribution": attribution,
        "events_active_users": active,
        "graph_triangles": triangles,
        "image_decode": image_decode,
        "image_near_dups": image_near_dups,
        "dedup_keep_best": keep_best,
        "eval_bcubed": bcubed,
        "events_rfm": rfm,
        "events_cooccurrence": cooccur,
        "join_interval_overlap": interval_overlap,
        "graph_link_pred": link_pred,
        "graph_hits": hits,
        "graph_pagerank_weighted": pr_weighted,
        "graph_bfs": bfs,
        "graph_modularity": modularity,
        "events_bots": bots,
        "profile_lorenz": lorenz,
        "sample_pps": pps,
    }
    inputs = {
        "blocking_token": (part1, part10_df),
        "ann_ivf": (emb1, emb10_df),
        "join_edit_capped": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "events_attribution": (ev1, ev10),
        "events_active_users": (ev1, ev10),
        "events_rfm": (ev1, ev10),
        "events_cooccurrence": (ev1, ev10),
        "join_interval_overlap": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "graph_link_pred": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "graph_hits": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "graph_pagerank_weighted": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "graph_bfs": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "graph_modularity": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "events_bots": (ev1, ev10),
        "profile_lorenz": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
        "image_decode": (img1, img10),
        "image_near_dups": (img1, img10),
        "graph_triangles": (
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(cust10),
        ),
    }

    results = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        a, b = inputs.get(name, (docs1, docs10_df))
        # warm the scans so both measurements see cached files equally
        a.count(); b.count()
        t0 = time.perf_counter(); n1 = fn(a).count()
        t1 = time.perf_counter(); n10 = fn(b).count()
        t2 = time.perf_counter()
        sec1, sec10 = t1 - t0, t2 - t1
        results[name] = {
            "rows_1x": n1, "rows_10x": n10,
            "sec_1x": round(sec1, 2), "sec_10x": round(sec10, 2),
            "row_ratio": round(n10 / max(n1, 1), 2),
            "time_ratio": round(sec10 / max(sec1, 1e-9), 2),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
