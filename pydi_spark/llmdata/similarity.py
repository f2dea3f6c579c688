"""Similarity search over embedding columns (array<float>).

North-star operator (BASELINE.json): approximate nearest neighbour over
an embedding column. Baseline = brute-force cosine top-k as native
expressions (zip_with dot product — JVM-side, codegen'd); scale path =
LSH-bucketed candidates (random hyperplanes) with exact re-scoring —
both sides stay distributed, no driver collection of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, fully native."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """[query_id, neighbor_id, cosine, rank]: exact top-k by cosine.

    The query side is broadcast (queries are user-request sized); the
    corpus side streams — the join is a broadcast nested loop producing
    |corpus| x |queries| scored rows, pruned by a per-query top-k window.
    Deterministic: rank orders by (rounded score desc, neighbor id).
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = F.broadcast(
        queries.select(
            F.col(qid).cast("string").alias("query_id"),
            F.col(qvec).alias("__qvec"),
        )
    )
    c = corpus.select(
        F.col(id_col).cast("string").alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
    )
    scored = q.crossJoin(c).withColumn(
        "cosine", cosine_expr(F.col("__qvec"), F.col("__cvec"))
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.0,
    lsh_bits: int = 16,
    lsh_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH band join + exact cosine re-scoring.

    Both sides distributed; recall < 1 (tunable via bits/bands). The
    scale path when queries are corpus-sized (all-pairs kNN joins).
    """
    from pydi_spark.blocking.embedding import EmbeddingBlocker

    blocker = EmbeddingBlocker(
        vector_column=vec_col,
        method="lsh",
        top_k=k,
        threshold=threshold,
        lsh_bits=lsh_bits,
        lsh_bands=lsh_bands,
        seed=seed,
    )
    pairs = blocker.block(queries, corpus, id_column=id_col)
    w = Window.partitionBy("id1").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.col("id2")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id1").alias("query_id"),
            F.col("id2").alias("neighbor_id"),
            F.col("score").alias("cosine"),
            "rank",
        )
    )
