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
    # n_chunks = size(starts) BEFORE the explode keeps the whole op a
    # narrow per-row transformation (a count-over-doc window after the
    # explode would add an exchange on the exploded frame)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        text.alias("__text"),
        F.size(starts).alias("n_chunks"),
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    return out.select(
        "doc_id",
        "chunk_index",
        "chunk_start",
        F.col("__text")
        .substr(F.col("chunk_start") + 1, F.lit(chunk_chars))
        .alias("chunk_text"),
        "n_chunks",
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


def pack_sequences(
    df: DataFrame,
    capacity_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign whole documents, in doc-id order
    within each source, to consecutive fixed-capacity bins (the
    pretraining batching step that concatenates documents into context
    windows). A document that would overflow the current bin opens the
    next one; a document longer than the capacity occupies a bin alone
    (overfull, visible via bin_fill > capacity).

    Output: [doc_id, source, n_tokens, bin_id, bin_fill] where bin_id
    counts from 0 per source and bin_fill is the bin's running total
    after placing the document. With sharding, a ``shard_id`` column is
    added and bin_id counts from 0 per (source, shard).

    Scale contract: packing is sequential WITHIN a packing group — one
    applyInPandas task holds the whole group. With ``n_shards=None``
    the group is the source, so a corpus with a handful of sources
    serializes onto a handful of tasks and every group's rows must fit
    one executor. At corpus scale pass ``n_shards``: each document is
    assigned a deterministic md5-hash shard (partition-independent,
    reproducible — same property as :func:`deterministic_sample`), and
    packing runs per (source, shard) with parallelism
    ``n_sources * n_shards`` and O(|shard|) group state.

    Shard-boundary semantics (explicit, documented): bins NEVER span
    shards — the sharded result is exactly independent greedy packing
    of each shard's own doc-id-ordered subsequence (pinned by a pytest
    equivalence test). Relative to unsharded packing this (a) partitions
    each source's doc sequence into n_shards hash-interleaved
    subsequences rather than one, and (b) leaves at most one partially
    filled trailing bin per shard instead of one per source. Bin
    CONTENTS therefore differ from the unsharded order — acceptable for
    pretraining batching, where bin composition only needs determinism,
    not a single global order.
    """
    import pandas as pd

    cap = int(capacity_tokens)
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        toks.cast("bigint").alias("n_tokens"),
    )
    sharded = n_shards is not None and int(n_shards) > 1
    if sharded:
        base = base.withColumn(
            "shard_id",
            F.floor(hash_fraction(F.col("doc_id")) * F.lit(int(n_shards))).cast("int"),
        )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fills and fill + n > cap:
                bin_id += 1
                fill = 0
            fill += n
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int32")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    if sharded:
        return base.groupBy("source", "shard_id").applyInPandas(
            pack,
            schema="doc_id long, source string, shard_id int, n_tokens long, "
                   "bin_id int, bin_fill long",
        )
    return base.groupBy("source").applyInPandas(
        pack,
        schema="doc_id long, source string, n_tokens long, bin_id int, bin_fill long",
    )
