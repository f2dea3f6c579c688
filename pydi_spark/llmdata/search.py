"""Lexical search over a document corpus: inverted index + BM25.

North-star adds (the reference has no retrieval surface): build the
posting lists a search system needs, and rank documents for a keyword
query with a BM25-family score.

Scale design: everything derives from ONE tokenize+explode pass.
The inverted index is a single groupBy(token) with map-side partial
aggregation; posting lists are bounded per token (cap + deterministic
order) so a head token cannot produce an unbounded row. BM25 computes
per-(doc, term) term frequencies with conditional aggregation in the
same per-doc pass (no per-term join), and the corpus statistics it
needs (N, avgdl, per-term document frequencies) reduce to ONE scalar
row that broadcasts.

Float determinism: the score for each term is an explicit arithmetic
expression combined in a FIXED order (term list order), and the idf is
the raw-ratio Robertson form WITHOUT the log — ln() differs in the
last ulp across engines (NOTES.md invariant 1), a monotone rational
idf keeps every double bit-identical cross-engine while preserving the
ranking behavior that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydi_spark.functions.tokenize import word_tokens


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(text_col)).alias("token"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> DataFrame:
    """Posting lists: [token, doc_freq, total_tf, postings] where
    ``postings`` is ``"doc:tf"`` pairs joined by ``,`` in ascending
    doc_id order, truncated to ``max_postings`` entries (the full
    doc_freq is still reported, so truncation is visible).

    The per-token list is assembled with collect_list over pre-reduced
    (doc, tf) counts — the shuffle carries one small struct per
    (token, doc), never text.
    """
    tf = (
        _tokens(df, text_col, id_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                        1,
                        max_postings,
                    ),
                    lambda x: F.concat_ws(":", x["doc_id"], x["tf"]),
                ),
                ",",
            ).alias("postings"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25 with
    raw-ratio idf: ``idf(t) = (N - df + 0.5) / (df + 0.5)`` (Robertson
    idf without the ln — monotone in df, cross-engine bit-exact) and
    the standard length-normalized tf saturation
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Output: [doc_id, score, rank] — rank 1..k by (score desc, doc_id),
    zero-score documents excluded. One tokenize pass, one per-doc
    aggregate, one broadcast scalar join, one top-k window.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(df, text_col, id_col)
    # per-doc: document length + tf of each query term, one pass
    aggs = [F.count("*").alias("dl")] + [
        F.sum((F.col("token") == F.lit(t)).cast("bigint")).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = toks.groupBy("doc_id").agg(*aggs)
    # corpus scalars: N, avgdl, df per term — one 1-row frame
    stat_aggs = [
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ] + [
        F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
        for i in range(len(terms))
    ]
    stats = per_doc.agg(*stat_aggs)
    j = per_doc.crossJoin(F.broadcast(stats))

    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
        )
        term_score = idf * (tf * F.lit(float(k1) + 1.0) / denom)
        score = term_score if score is None else score + term_score
    scored = j.select("doc_id", score.alias("score")).where(F.col("score") > 0)
    # top-k via sort+limit (TakeOrderedAndProject — per-partition heaps,
    # no global shuffle), THEN rank the k survivors; a bare row_number
    # window here would funnel the whole corpus through one partition
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))
