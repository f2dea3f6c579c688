"""Line-level document cleaning for training-data pipelines.

C4/CCNet-style cleanup (beyond the reference — north-star LLM-data op):
per-line rules (word-count bounds, terminal punctuation) plus
corpus-level boilerplate removal — a line that appears in more than
``max_line_doc_frequency`` distinct documents ("share this article",
cookie banners, nav footers) is dropped everywhere.

Scale design: one posexplode over lines, native-expression rules, ONE
groupBy(line) frequency aggregate for the global pass (shuffles a
trimmed line key, never the document), a left-anti join against the
(small by construction) hot-line table, and an order-preserving
re-assembly groupBy. No Python in the path; every stage is
partition-parallel and survives a corpus that doesn't fit one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_document_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 1,
    max_words: int | None = None,
    require_terminal_punct: bool = False,
    max_line_doc_frequency: int | None = None,
) -> DataFrame:
    """[doc_id, clean_text, n_lines_kept, n_lines_total].

    Lines failing a rule are dropped; the document survives (possibly
    empty). ``max_line_doc_frequency``: drop lines occurring in more
    than this many distinct documents (global boilerplate).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    lines = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    trimmed = F.trim(F.col("line"))
    wc = F.size(F.filter(F.split(trimmed, r"\s+"), lambda x: x != F.lit("")))
    keep = wc >= F.lit(int(min_words))
    if max_words is not None:
        keep = keep & (wc <= F.lit(int(max_words)))
    if require_terminal_punct:
        keep = keep & trimmed.rlike(r"[.!?\"']$")
    flagged = lines.withColumn("__norm", trimmed).withColumn("keep", keep)

    if max_line_doc_frequency is not None:
        hot = (
            flagged.where(F.col("keep"))
            .groupBy("__norm")
            .agg(F.countDistinct("doc_id").alias("__df"))
            .where(F.col("__df") > F.lit(int(max_line_doc_frequency)))
            .select("__norm", F.lit(True).alias("__hot"))
        )
        flagged = flagged.join(hot, "__norm", "left").withColumn(
            "keep", F.col("keep") & F.col("__hot").isNull()
        )

    # full-width reassembly; collect_list skips the nulls from when()
    return (
        flagged.repartition(parallelism, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_lines_kept"),
            F.count("*").alias("n_lines_total"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )
