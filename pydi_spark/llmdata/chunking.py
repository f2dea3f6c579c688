"""Document chunking and token-budget corpus selection.

Training-data preprocessing ops beyond the reference (north-star adds):
RAG/pretraining pipelines split documents into bounded windows and
assemble corpora against per-source token budgets.

Scale design: chunking is one generator expression per row (explode of
an arithmetic sequence + substr) — no shuffle at all, output streams
straight to the sink. Budget selection is one window cumsum per source
partition over a deterministic hash order; only (source, token-count)
pairs shuffle, never document bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydi_spark.llmdata.sampling import hash_fraction


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-width character windows with overlap.

    Output: one row per chunk — [doc_id, chunk_index, chunk_start,
    chunk_text, n_chunks]. Chunk ``i`` starts at ``i * (chunk_chars -
    overlap)``; every document yields at least one chunk (empty text →
    one empty chunk), and every character lands in at least one chunk.

    Narrow transformation: no shuffle, no Python — survives any corpus
    size that the scan survives.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(text) - 1, F.lit(0)), F.lit(step)
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        text.alias("__text"),
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    return out.select(
        "doc_id",
        "chunk_index",
        "chunk_start",
        F.col("__text")
        .substr(F.col("chunk_start") + 1, F.lit(chunk_chars))
        .alias("chunk_text"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_chunks"),
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source corpus selection under a token budget
    ("data mixing"): within each source, documents are taken in
    md5-hash order (a reproducible shuffle — same property as
    :func:`deterministic_sample`) until the cumulative whitespace token
    count reaches ``budget_tokens``.

    A document is kept iff the running total *including it* is within
    budget, so the selection is a prefix of the hash order and re-runs
    (or incremental additions that keep hash order) are stable.

    Output: [doc_id, source, n_tokens, cum_tokens, selected].
    """
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    )
    ranked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        toks.cast("bigint").alias("n_tokens"),
        hash_fraction(F.col(id_col)).alias("__frac"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("__frac", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn(
        "selected", F.col("cum_tokens") <= F.lit(int(budget_tokens))
    )
