"""Incremental corpus ingest with dedup-at-the-door.

The production shape for a growing training corpus: the historical
corpus exists only as its persisted MinHash signature store; each new
batch (a crawl increment) is deduped against the store AND within
itself, decisions are logged, and the kept documents' signatures are
appended so the next batch sees them.

Two drivers of the same operator:
  1. batch mode — call incremental_minhash_dedup per increment
  2. streaming mode — streaming_incremental_dedup (foreachBatch)

    python3 examples/incremental_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.llmdata import (  # noqa: E402
    incremental_minhash_dedup,
    minhash_signature_table,
)
from pydi_spark.streaming import streaming_incremental_dedup  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # seed: 60% of the corpus is "history" — persist ONLY its signatures
    store_path = os.path.join(work, "store")
    minhash_signature_table(
        docs.where("doc_id % 5 >= 2"), num_hashes=8
    ).write.parquet(store_path)

    # batch mode: two increments arrive over time
    for tag, pred in (("day1", "doc_id % 5 = 0"), ("day2", "doc_id % 5 = 1")):
        batch = docs.where(pred)
        store = spark.read.parquet(store_path)
        decisions = incremental_minhash_dedup(
            batch, store, num_hashes=8, bands=4, jaccard_threshold=0.7
        ).localCheckpoint(eager=True)
        summary = decisions.agg(
            F.count("*").alias("docs"),
            F.sum("matched_store").alias("dup_vs_store"),
            F.sum("kept").alias("net_new"),
        ).first()
        print(f"{tag}: {summary['docs']} docs, "
              f"{summary['dup_vs_store']} dup-vs-store, "
              f"{summary['net_new']} net-new admitted")
        kept = decisions.where("kept = 1").select("id")
        minhash_signature_table(batch, num_hashes=8).join(
            F.broadcast(kept), "id", "left_semi"
        ).write.mode("append").parquet(store_path)

    n_store = spark.read.parquet(store_path).count()
    print(f"signature store now holds {n_store} documents")

    # streaming mode: the same pipeline as a foreachBatch query. The
    # batch mixes exact copies of stored documents (rejected) with
    # fresh synthetic ones (admitted) so the demo shows both outcomes
    stream_src = os.path.join(work, "incoming")
    copies = (
        docs.where("doc_id % 10 = 3")
        .limit(25)
        .select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    )
    # each fresh doc gets its own md5-derived vocabulary (sharing a
    # template would — correctly — get all but one within-batch-deduped)
    fresh_tokens = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{i}"))),
                1,
                8,
            )
            for i in range(8)
        ],
    )
    fresh = (
        docs.where("doc_id % 10 = 4")
        .limit(25)
        .select(
            (F.col("doc_id") + 600000).alias("doc_id"),
            fresh_tokens.alias("text"),
        )
    )
    copies.unionByName(fresh).coalesce(1).write.parquet(
        os.path.join(stream_src, "b0")
    )
    schema = copies.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src + "/*")
    )
    decisions_path = os.path.join(work, "decisions")
    q = streaming_incremental_dedup(
        spark, stream, store_path, decisions_path,
        num_hashes=8, bands=4, jaccard_threshold=0.7,
    )
    q.awaitTermination()
    out = spark.read.parquet(decisions_path)
    out.groupBy("batch_id").agg(
        F.count("*").alias("docs"),
        F.sum("matched_store").alias("dup_vs_store"),
        F.sum("kept").alias("net_new"),
    ).orderBy("batch_id").show()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
