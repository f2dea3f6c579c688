"""Bloom-filter prefilter for incremental exact dedup.

The production shape this serves: a bounded crawl increment must be
deduped against a historical corpus whose KEY SET is huge (billions of
rows at 100 TB). A plain anti-join ships every batch row into a
store-sized shuffle. A Bloom filter over the store keys gives a cheaper
decision map-side: "definitely new" rows (the bulk of a fresh crawl)
never touch the store at all, and only "might contain" rows — true
duplicates plus an ``fpp`` sliver of false positives — proceed to the
exact anti-join. Bloom filters have NO false negatives, so the final
result is EXACT; the filter only routes work. (The same composition
Spark itself uses for runtime row-level filtering; no reference
counterpart — PyDI has no incremental surface.)

Determinism contract (the correctness gate relies on it): bit positions
derive from md5 double-hashing — h1 = first 15 md5 hex chars, h2 = next
15 forced odd, pos_i = (h1 + i*h2) mod m — computed with IDENTICAL
integer arithmetic on the JVM side (bitmap build, ``F.conv`` on md5
substrings) and the Python side (membership probe). All terms stay far
below 2^63 for m <= 2^40, so both engines wrap identically.

Scale shape: the bitmap build is one narrow aggregate over the store
(positions -> 64-bit words -> bit_or), collected as m/64 longs and
broadcast — 16 MiB at m=2^27, the right size for stores up to ~10^8
keys at 1% fpp. Beyond that, shard the filter by a key-hash prefix and
build one bitmap per shard (each stays broadcast-sized); the probe
routes on the same prefix. The membership probe is an Arrow-batched
pandas UDF (one md5 per row); the exact verify anti-join sees only the
might-contain subset.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves the hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bloom_hash_cols(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """JVM-side bit positions; `_bloom_positions_py` is the exact
    Python mirror — change BOTH or membership breaks (false negatives
    surface as missing output rows under the oracle gate)."""
    md5 = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long") % m_bits
    h2r = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long") % m_bits
    h2 = F.when(h2r % 2 == 0, h2r + 1).otherwise(h2r)
    return [(h1 + F.lit(i) * h2) % m_bits for i in range(int(n_hashes))]


def _bloom_positions_py(s: str, m_bits: int, n_hashes: int) -> list[int]:
    import hashlib

    d = hashlib.md5(s.encode("utf-8")).hexdigest()
    h1 = int(d[:15], 16) % m_bits
    h2 = int(d[15:30], 16) % m_bits
    if h2 % 2 == 0:
        h2 += 1
    return [(h1 + i * h2) % m_bits for i in range(n_hashes)]


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int, n_hashes: int):
    """numpy int64 bitmap (length m/64) over the distinct non-null
    keys. One narrow aggregate: explode positions -> distinct ->
    (word, bit_or(mask)) -> collect set-words only (sparse for small
    stores)."""
    import numpy as np

    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    # no distinct() before the groupBy: bit_or is idempotent, and the
    # map-side partial aggregate already collapses each partition to
    # <= m/64 word rows — a distinct would add a full n*k-row exchange
    # for nothing
    pos = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(*_bloom_hash_cols(F.col(key_col), m_bits, n_hashes))
        ).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        arr[int(r["word"])] = r["bits"]
    return arr


def bloom_prefilter_dedup(
    new_df: DataFrame,
    store_df: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 22,
    n_hashes: int = 5,
) -> DataFrame:
    """EXACT incremental dedup with a Bloom fast path: returns the
    batch rows whose ``key_col`` does not occur in the store.

    Rows the filter calls "definitely new" (no false negatives) pass
    through map-side with NO store join; only the might-contain subset
    runs the exact anti-join, so false positives cost a join row, never
    a wrong answer. Null keys are never duplicates (kept), matching
    anti-join semantics. Output schema == new_df's.
    """
    spark = new_df.sparkSession
    arr = bloom_bitmap(store_df.select(key_col), key_col, m_bits, n_hashes)
    bc = spark.sparkContext.broadcast(arr)
    m, k = int(m_bits), int(n_hashes)

    @F.pandas_udf("boolean")
    def might_contain(s: pd.Series) -> pd.Series:
        a = bc.value
        out = []
        for v in s:
            if v is None:
                out.append(False)
                continue
            hit = True
            for p in _bloom_positions_py(str(v), m, k):
                if not (int(a[p >> 6]) >> (p & 63)) & 1:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out)

    flagged = new_df.withColumn(
        "__might", might_contain(F.col(key_col).cast("string"))
    )
    definite_new = flagged.where(~F.col("__might"))
    maybe = flagged.where(F.col("__might"))
    store_keys = (
        store_df.select(F.col(key_col).alias("__store_key"))
        .where(F.col("__store_key").isNotNull())
        .distinct()
    )
    verified_new = maybe.join(
        store_keys, maybe[key_col] == store_keys["__store_key"], "left_anti"
    )
    return definite_new.unionByName(verified_new).drop("__might")
