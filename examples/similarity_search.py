"""Similarity-search strategy tour over the synthetic embeddings.

Runs the same top-k query through every ANN strategy the engine ships,
prints recall@k against the exact baseline, and shows the cost shape of
each — the decision table a user works through when the corpus grows:

  brute force    exact, O(n) per query; query side broadcast
  LSH            hyperplane bands; both sides distributed
  IVF            coarse cells, nprobe scan; sample-trained centroids
  PQ (ADC)       codes instead of vectors; 8 bytes per 64-dim float
  IVF-PQ         cells + residual codes — the billion-vector shape

    python3 examples/similarity_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.llmdata import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from pydi_spark.llmdata.similarity import _kmeans_centroids  # noqa: E402

K = 10


def recall(approx_ids: list, exact_ids: list) -> float:
    return len(set(approx_ids) & set(exact_ids)) / max(1, len(exact_ids))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-ann")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.orderBy("vec_id").limit(3)

    # exact baseline
    exact = brute_force_topk(corpus, queries, k=K).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])

    # LSH: banded hyperplane candidates + exact re-score
    lsh = lsh_topk(corpus, queries, k=K, lsh_bits=16, lsh_bands=4).collect()
    lsh_by_q = {}
    for r in lsh:
        lsh_by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])

    # IVF: sample-trained cells, nprobe
    ivf = ivf_topk(corpus, queries, k=K, nprobe=4).collect()
    ivf_by_q = {}
    for r in ivf:
        ivf_by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])

    print(f"recall@{K} vs exact (3 queries):")
    for name, by_q in (("lsh", lsh_by_q), ("ivf", ivf_by_q)):
        rs = [recall(by_q.get(q, []), ids) for q, ids in exact_by_q.items()]
        print(f"  {name:7s} {sum(rs) / len(rs):.2f}")

    # PQ: one query vector through codes-only ADC ranking
    cbs = train_pq_codebooks(corpus, n_subspaces=8, n_centroids=16)
    codes = pq_encode(corpus, cbs).localCheckpoint()
    qvec = [float(x) for x in queries.collect()[0]["embedding"]]
    adc = pq_adc_topk(codes, cbs, qvec, k=K).collect()
    q0 = str(queries.collect()[0]["vec_id"])
    pq_ids = [str(r["id"]) for r in adc]
    print(f"  pq-adc  {recall(pq_ids, exact_by_q[q0]):.2f}  "
          f"(codes: {len(cbs)} bytes/vector vs 256)")

    # IVF-PQ: cells + residual codes, nprobe-limited scan
    coarse = [[float(x) for x in c]
              for c in _kmeans_centroids(corpus, "embedding", 16,
                                         sample_size=2000, seed=3)]
    ivfpq = ivfpq_topk(corpus, coarse, cbs, qvec, k=K, nprobe=4).collect()
    ivfpq_ids = [str(r["id"]) for r in ivfpq]
    print(f"  ivf-pq  {recall(ivfpq_ids, exact_by_q[q0]):.2f}  "
          f"(scanned ~{4}/{16} cells)")
    # hybrid retrieval: BM25 over the document text + cosine over the
    # aligned embeddings, fused by reciprocal rank — the two-channel
    # first stage a RAG system runs before any reranker
    from pydi_spark.llmdata import hybrid_rrf_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fused = hybrid_rrf_topk(
        docs, corpus, ["stream", "hash", "customer"], qvec, k=10, n_each=50
    )
    print("hybrid BM25+cosine RRF top-10 (lex_rank/sem_rank 0 = absent "
          "from that channel):")
    fused.show(10, truncate=False)

    # second stage: rerank the fused candidates with the injectable
    # cross-encoder seam (default = deterministic term-overlap scorer;
    # production plugs a real model client into scorer_factory)
    from pydi_spark.llmdata import rerank_topk

    reranked = rerank_topk(
        fused, docs, ["stream", "hash", "customer"], k=5
    )
    print("reranked top-5:")
    reranked.show(5, truncate=False)

    print("note: the synthetic embeddings are near-uniform random — the "
          "worst case for ANN recall. On clustered real embeddings the "
          "same settings sit far higher; tune bits/bands, nprobe, and "
          "codebook size against a recall target, not defaults.")


if __name__ == "__main__":
    main()
