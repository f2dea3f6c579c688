"""Fixed-OUTPUT scale-up probe: 100x the corpus, constant emitted pairs.

The 10x probe (tools/scale_probe.py) scales true output with the input,
so the emit-bound pair generators (dedup_minhash 3.3-3.7x, blocking_token
~10x for 10x data) read as linear-in-OUTPUT — correct, but it leaves the
scan+shuffle side unmeasured past 10x (VERDICT r10 #5). This probe holds
the output CONSTANT while the input grows 10x and 100x: the original 1x
slice keeps its full near-dup / shared-token structure, and every added
row is token-UNIQUE filler (tokens are md5(id:i) hex strings — globally
unique, so filler rows join nothing, band-collide with nothing, and emit
nothing). A linear scan+shuffle pipeline should then scale ~linearly in
INPUT rows; a hidden quadratic stage (all-pairs on the banded table, a
fanout on the token table) would blow past it.

    python3 tools/scale_probe_fixed.py [sf_dir] [ops...]

Synthetic tables land under spark-warehouse/scale_probe_fixed/ (real
parquet scans, so size estimates and broadcast gates behave as in
production). Prints one JSON line per op:
  {"op": ..., "rows": {"1x": n, ...}, "out_rows": {"1x": n, ...},
   "sec": {"1x": t, ...}, "time_ratio_100x": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [1, 10, 100]
FILLER_TOKENS = 25  # ~ the real corpus' mean distinct tokens per doc


def _synth(spark, src_path: str, out_path: str, id_col: str,
           text_col: str, scale: int) -> None:
    """1x slice verbatim + (scale-1) filler clones whose every token is
    md5(id:i) — globally unique, pair-inert."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_path, "_SUCCESS")):
        return
    base = spark.read.parquet(src_path).select(id_col, text_col)
    parts = [base]
    for k in range(1, scale):
        filler_text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(FILLER_TOKENS)),
                lambda i: F.md5(
                    F.concat_ws(
                        ":", F.lit(str(k)), F.col(id_col).cast("string"),
                        i.cast("string"),
                    )
                ),
            ),
        )
        parts.append(
            base.select(
                (F.col(id_col) + F.lit(k * 10_000_000)).alias(id_col),
                filler_text.alias(text_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(out_path)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not sf_dir.startswith("/"):
        sf_dir = f"/root/testdata/{sf_dir}"
    ops = sys.argv[2:] or ["dedup_minhash", "blocking_token"]

    from pydi_spark import get_spark

    spark = get_spark("scale_probe_fixed")
    spark.sparkContext.setLogLevel("ERROR")
    # cache key includes the sf and the filler width: a rerun against a
    # different corpus must never silently reuse the previous corpus'
    # synthetic tables (r11 self-review)
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        f"scale_probe_fixed_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_ft{FILLER_TOKENS}",
    )

    def minhash(df):
        from pydi_spark.llmdata import minhash_near_duplicates

        return minhash_near_duplicates(
            df, num_hashes=8, bands=4, jaccard_threshold=0.7
        )

    def tok_block(df):
        from pydi_spark.blocking import TokenBlocker

        # the production hot-token cap: bounds any one token's pair
        # fanout; on this corpus the filler tokens are all unique so the
        # cap only guards the 1x slice's hot tokens (same output at
        # every scale)
        df = df.select(
            F.col("p_partkey").alias("rid"), F.col("p_name").alias("name")
        )
        return TokenBlocker("name", max_token_frequency=250).block(
            df, df, id_column="rid"
        )

    from pyspark.sql import functions as F

    # --- r12 families: synthetic shapes beyond (id, text) -------------
    # Filler design notes (each op's filler is PAIR-INERT and disjoint
    # from the 1x slice, so output is constant at every scale):
    #   edit_distance: filler strings are md5 hex TRANSLATED to the
    #     uppercase alphabet G..V — disjoint from lowercase p_name, so
    #     with the gram cap every filler gram goes hot and prunes away
    #     without shifting any 1x gram frequency; 32 > short_len keeps
    #     filler out of the short-string fallback.
    #   grid_distance: filler points on a distant line spaced 3*cell
    #     apart — no two within radius, <= 1 per cell.
    #   interval_overlap: probe (left) side pinned to the 1x table;
    #     the build side scales with far-future intervals spaced 10x
    #     their length — overlap nothing, ~1 bucket each.
    #   dedup_simhash: unique-token filler docs => effectively random
    #     60-bit fingerprints. This probe EXPECTS superlinear growth at
    #     bands=4 (15-bit keys: buckets densify as N / 2^15) and
    #     near-linear at bands=3 (20-bit keys) — the documented knob:
    #     band width must grow with log2(corpus); the recall guarantee
    #     drops from Hamming<=3 to Hamming<=2.

    part_src = f"{sf_dir}/part.parquet"

    def synth_strings(path, scale):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        base = spark.read.parquet(part_src).select(
            F.col("p_partkey").alias("rid"), F.col("p_name").alias("name"))
        parts = [base]
        for k in range(1, scale):
            parts.append(base.select(
                (F.col("rid") + F.lit(k * 10_000_000)).alias("rid"),
                F.translate(
                    F.md5(F.concat_ws(":", F.lit(str(k)),
                                      F.col("rid").cast("string"))),
                    "0123456789abcdef", "GHIJKLMNOPQRSTUV",
                ).alias("name")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(path)

    GRID_CELL = 5.0

    def synth_points(path, scale):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        base = spark.read.parquet(part_src).select(
            F.col("p_partkey").alias("rid"))
        parts = [base.select(
            "rid",
            ((F.col("rid") * 7919 % 10000) / 10.0).alias("x"),
            ((F.col("rid") * 104729 % 10000) / 10.0).alias("y"))]
        for k in range(1, scale):
            parts.append(base.select(
                (F.col("rid") + F.lit(k * 10_000_000)).alias("rid"),
                (F.lit(1e6) + (F.lit(k * 20_000_000) + F.col("rid"))
                 * F.lit(3 * GRID_CELL)).alias("x"),
                F.lit(0.0).alias("y")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(path)

    def synth_intervals(path, scale):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        base = spark.read.parquet(part_src).select(
            F.col("p_partkey").alias("rid"))
        s = (F.col("rid") * 13 % 100000).cast("double")
        parts = [base.select(
            "rid", s.alias("s"),
            (s + 50 + F.col("rid") % 200).alias("e"))]
        for k in range(1, scale):
            fs = (F.lit(1e7) + (F.lit(k * 20_000_000) + F.col("rid"))
                  * F.lit(1000.0))
            parts.append(base.select(
                (F.col("rid") + F.lit(k * 10_000_000)).alias("rid"),
                fs.alias("s"), (fs + F.lit(100.0)).alias("e")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(path)

    def edit_dist(df):
        from pydi_spark.functions.joins import edit_distance_join

        return edit_distance_join(
            df, None, "name", max_distance=1, id_column="rid", q=2,
            max_gram_frequency=500)

    def grid(df):
        from pydi_spark.functions.joins import grid_distance_join

        return grid_distance_join(
            df, None, "x", "y", radius=GRID_CELL, id_column="rid")

    def simhash4(df):
        from pydi_spark.llmdata.dedup import simhash_near_duplicates

        return simhash_near_duplicates(df, max_hamming=3, bands=4)

    def simhash3(df):
        from pydi_spark.llmdata.dedup import simhash_near_duplicates

        return simhash_near_duplicates(df, max_hamming=2, bands=3)

    specs = {
        "dedup_minhash": (
            f"{sf_dir}/documents.parquet", "doc_id", "text", minhash),
        "blocking_token": (
            f"{sf_dir}/part.parquet", "p_partkey", "p_name", tok_block),
        "dedup_simhash": (
            f"{sf_dir}/documents.parquet", "doc_id", "text", simhash4),
        "dedup_simhash_b3": (
            f"{sf_dir}/documents.parquet", "doc_id", "text", simhash3),
    }
    custom = {
        "edit_distance": (synth_strings, edit_dist),
        "grid_distance": (synth_points, grid),
        "interval_overlap": (synth_intervals, None),  # needs the 1x left
    }
    results = {}
    for op in ops:
        rows, out_rows, secs = {}, {}, {}
        for scale in SCALES:
            path = os.path.join(scratch, f"{op}_{scale}x")
            if op in custom:
                synth_fn, run_fn = custom[op]
                synth_fn(path, scale)
                df = spark.read.parquet(path)
                if op == "interval_overlap":
                    from pydi_spark.functions.joins import (
                        interval_overlap_join,
                    )

                    one_path = os.path.join(scratch, f"{op}_1x")
                    synth_fn(one_path, 1)
                    left = spark.read.parquet(one_path)
                    out_df = interval_overlap_join(
                        left, df, ("s", "e"), ("s", "e"),
                        bucket_width=256.0)
                else:
                    out_df = None
            else:
                src, id_col, text_col, fn = specs[op]
                _synth(spark, src, path, id_col, text_col, scale)
                df = spark.read.parquet(path)
                out_df = None
            n_in = df.count()  # warm the scan
            t0 = time.time()
            if out_df is None:
                run = custom[op][1] if op in custom else specs[op][3]
                out_df = run(df)
            n_out = out_df.count()
            dt = round(time.time() - t0, 2)
            key = f"{scale}x"
            rows[key], out_rows[key], secs[key] = n_in, n_out, dt
        results[op] = {
            "rows": rows, "out_rows": out_rows, "sec": secs,
            "time_ratio_10x": round(secs["10x"] / secs["1x"], 2),
            "time_ratio_100x": round(secs["100x"] / secs["1x"], 2),
        }
        print(json.dumps({op: results[op]}), flush=True)


if __name__ == "__main__":
    main()
