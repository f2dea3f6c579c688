from pydi_spark.llmdata.chunking import (
    chunk_documents,
    pack_sequences,
    select_token_budget,
)
from pydi_spark.llmdata.cleaning import (
    clean_document_lines,
    decontaminate,
    dedup_corpus_lines,
)
from pydi_spark.llmdata.dedup import (
    canonical_corpus,
    embedding_near_duplicates,
    exact_duplicates,
    minhash_signatures,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    semantic_dedup_pairs,
    simhash_fingerprint,
    simhash_near_duplicates,
)
from pydi_spark.llmdata.sampling import (
    deterministic_sample,
    hash_fraction,
    quality_weighted_sample,
    temperature_mix,
)
from pydi_spark.llmdata.search import bm25_scores, inverted_index
from pydi_spark.llmdata.spans import exact_span_stats
from pydi_spark.llmdata.similarity import (
    auto_n_centroids,
    brute_force_topk,
    cosine_expr,
    ivf_topk,
    lsh_topk,
)
from pydi_spark.llmdata.textstats import (
    document_fingerprint,
    language_id,
    quality_filter,
    quality_scores,
    repetition_scores,
    tfidf_keywords,
    token_counts,
    unigram_lm_scores,
    vocabulary,
)

__all__ = [
    "bm25_scores",
    "clean_document_lines",
    "decontaminate",
    "dedup_corpus_lines",
    "quality_weighted_sample",
    "semantic_dedup_pairs",
    "unigram_lm_scores",
    "auto_n_centroids",
    "brute_force_topk",
    "chunk_documents",
    "exact_span_stats",
    "inverted_index",
    "select_token_budget",
    "canonical_corpus",
    "deterministic_sample",
    "hash_fraction",
    "temperature_mix",
    "cosine_expr",
    "document_fingerprint",
    "embedding_near_duplicates",
    "exact_duplicates",
    "ivf_topk",
    "language_id",
    "pack_sequences",
    "lsh_topk",
    "minhash_near_duplicates",
    "minhash_signatures",
    "ngram_jaccard_duplicates",
    "quality_filter",
    "quality_scores",
    "repetition_scores",
    "tfidf_keywords",
    "simhash_fingerprint",
    "simhash_near_duplicates",
    "token_counts",
    "vocabulary",
]
