"""Corpus deduplication operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north-star): exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
each a lazy DataFrame transformation designed for 100 TB corpora:

- **exact**: hash-groupBy on md5(text) — one shuffle on a 32-byte key,
  never on the document bytes.
- **minhash**: portable min-wise hashing — signature_i = min over tokens
  of the Carter-Wegman lane (a_i * h31(token) + b_i) mod 2^31-1 over a
  shared per-token md5-prefix hash (ONE md5 per token; pure int64
  arithmetic keeps signatures engine-portable — identical in DuckDB for
  the oracle — and deterministic across runs). LSH bands equi-join
  candidates (linear), exact token-set Jaccard verifies survivors. No
  O(n^2) stage.
- **simhash**: 60-bit fingerprints from per-token md5 bits; Hamming-
  near pairs found with the band trick (split bits into b bands; a pair
  within Hamming distance b-1 shares >= 1 exact band) — again equi-join,
  not all-pairs.
- **ngram_jaccard**: shingle token sets, token-block candidates, verify
  with array-set Jaccard.
- **embedding cosine**: delegated to llmdata.similarity (brute/LSH).

All computations are native Column expressions (md5, transform,
aggregate, array_*); no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydi_spark.functions.tokenize import word_tokens

# build-side ceiling for pinning verify joins as broadcasts: the token /
# shingle side table is at most input-text sized, so the decision keys on
# the INPUT relation's Catalyst size estimate (file-size based for
# parquet scans — reliable), not on the derived table's estimate (wildly
# off after explode/groupBy)
BROADCAST_VERIFY_MAX_BYTES = 1 << 30  # 1 GiB


def _resolve_broadcast_verify(
    df: DataFrame, broadcast_verify, max_bytes: int = BROADCAST_VERIFY_MAX_BYTES
) -> bool:
    """'auto' -> broadcast iff the input relation's size estimate fits the
    ceiling. At bench scale the pin avoids a 5-10x slower sort-merge join
    over the quadratic candidate set; at corpus scale (100 TB) the token
    table cannot be broadcast and the join must shuffle."""
    if broadcast_verify != "auto":
        return bool(broadcast_verify)
    from pydi_spark.core.plansize import fits_estimate

    return fits_estimate(df, max_bytes)


# ------------------------------------------------------------------- exact

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[id, content_hash, canonical_id, is_duplicate]: canonical = min id
    per hash; dedup = filter is_duplicate."""
    hashed = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    canon = hashed.groupBy("content_hash").agg(F.min("id").alias("canonical_id"))
    return (
        hashed.join(canon, "content_hash")
        .select(
            "id",
            "content_hash",
            "canonical_id",
            (F.col("id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


# ----------------------------------------------------------------- minhash

# MinHash permutation family: h_i(t) = (a_i * h31(t) + b_i) mod P over
# the token's 31-bit hash h31 = h32 mod P (h32 = top 32 bits of the
# same 60-bit md5 prefix the verification token sets carry), with
# P = 2^31 - 1 (Mersenne) and a_i, b_i drawn over the FULL [0, P)
# range — the textbook Carter-Wegman 2-universal family, so the lanes
# mix independently (a first r11 draft capped a < 2^30 against a
# 2^61-1 modulus; a*h then wrapped at most once, the lanes all
# tracked min(h32), and band recall dropped ~17% — measured before it
# shipped). ONE md5 per token feeds all lanes — the r11 rewrite of
# the original min(md5(f"{i}:{tok}")) family, which paid num_hashes
# md5 STRING hashes per token row and dominated the signature stage
# (VERDICT r10 #4; measured ~30% off the whole query at sf0.1).
# Overflow-exact in int64: a, h31 < 2^31 keep a*h31 + b < 2^62, so
# the arithmetic replays verbatim in any engine with 64-bit integers
# (the DuckDB oracles replay it literally). Constants: fixed seeded
# draw (random.Random(0x5EED)) — pinned literals so signatures are
# stable across releases (persisted signature STORES depend on them;
# changing the family invalidates stores, which is why the constants
# live here and not in a config).
MINHASH_PRIME = (1 << 31) - 1
MINHASH_AB: list[tuple[int, int]] = [
    (304421255, 1836435294), (1317016046, 875424808),
    (421060966, 1255111736), (1858959911, 1760892882),
    (901865199, 1375823314), (1032573392, 666550374),
    (1320671556, 1683497692), (1638461524, 1734674000),
    (740751845, 474759081), (1885041032, 1572479927),
    (873515665, 1245340700), (1359527323, 1367669501),
    (1291406679, 2088798602), (853482072, 850667823),
    (974347029, 1930316807), (1333742723, 2040025221),
    (715041703, 479988512), (1751766369, 120994845),
    (738198214, 1284782988), (1707367833, 1901732561),
    (1607381208, 555486236), (1619614216, 598578556),
    (305969688, 1320794893), (1712586462, 1388530616),
    (520304286, 108330589), (801806062, 538093310),
    (1348224564, 1598573495), (1292363125, 1672632354),
    (1427884308, 111702067), (417926054, 239387588),
    (833231784, 684276013), (755017778, 1718416179),
]


def minhash_signatures(
    text: Column, num_hashes: int = 16
) -> Column:
    """array<bigint> of length num_hashes; element i = min over word
    tokens of (a_i * h31(token) + b_i) mod P — the same Carter-Wegman
    min-wise family ``minhash_signature_table`` aggregates, as a
    Column expression for per-row use (note: transform/array_min are
    interpreted, not codegen'd — prefer the table variant in bulk
    paths)."""
    if num_hashes > len(MINHASH_AB):
        raise ValueError(f"num_hashes > {len(MINHASH_AB)} unsupported")
    toks = F.array_distinct(word_tokens(text))
    h31s = F.transform(
        toks,
        lambda t: F.shiftrightunsigned(_token_hash60(t), 28)
        % F.lit(MINHASH_PRIME),
    )

    def lane(i: int) -> Column:
        a, b = MINHASH_AB[i]
        return F.array_min(
            F.transform(
                h31s, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)
            )
        )

    return F.array(*[lane(i) for i in range(num_hashes)])


def minhash_band_keys(sig: Column, num_hashes: int, bands: int) -> Column:
    """array<string> of band keys: md5 of the concatenated band slice
    (signature values render as decimal strings — the exact form the
    SQL oracles replay with CAST(s AS VARCHAR))."""
    rows = num_hashes // bands
    keys = [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(F.concat_ws(",", *[
                sig[b * rows + r].cast("string") for r in range(rows)
            ])),
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def token_set_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over distinct-element arrays. |union| is computed as
    |a|+|b|-|inter| — one array_intersect instead of intersect+union
    (halves the per-pair array work on quadratic verification stages)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a).cast("double") + F.size(b).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def jaccard_size_gate(a: Column, b: Column, threshold: float) -> Column:
    """Lossless size-ratio pre-filter for an exact ``jaccard >= t``
    verification: J = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|), so any
    pair with min < t*max can NEVER pass — prune it on two int lengths
    BEFORE the O(|A|+|B|) array intersect (guide §2.3; codegen
    short-circuits the AND). The 1e-9 slack makes float rounding fail
    OPEN (a borderline pair proceeds to the exact verify, never the
    other way), so the verified pair set is provably unchanged. The
    empty-vs-empty pair (J defined as 1.0) passes: min = max = 0."""
    lo = F.least(F.size(a), F.size(b)).cast("double")
    hi = F.greatest(F.size(a), F.size(b)).cast("double")
    return lo >= F.lit(float(threshold) - 1e-9) * hi



def _maybe_tokens(df: DataFrame, text_col: str) -> Column:
    """``word_tokens(text_col)`` — or the column itself when it already
    holds a token ARRAY. r13: dedup_method_agreement tokenizes the
    corpus ONCE (one scan + one regex split, checkpointed) and feeds
    the same array to all three generators; detection is by dtype so
    no generator API changes. The pre-split array is definitionally
    word_tokens' output, so every downstream expression is identical."""
    from pyspark.sql.types import ArrayType

    if isinstance(df.schema[text_col].dataType, ArrayType):
        return F.col(text_col)
    return word_tokens(F.col(text_col))

def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """[id, s0..s{n-1}, toks] — MinHash signatures plus the 60-bit
    hashed token set, in ONE tokenize+groupBy pass. This is also the
    signature STORE an incremental pipeline persists between batches
    (write it to parquet; ``incremental_minhash_dedup`` reads it back).

    Verification runs on 60-bit md5-prefix token HASHES (the portable
    SimHash construction), not token strings: set intersection over
    longs is several times cheaper than over 32-char strings, and the
    re-attach payload shrinks ~4x. Jaccard over hashed sets equals
    jaccard over tokens up to md5 collisions, which strike both engines
    identically (the oracle hashes the same way).

    Signatures via explode + native min aggregates (codegen'd) instead
    of array_min(transform(...)) (interpreted higher-order functions);
    ONE groupBy produces the signatures AND the hashed token sets, so
    the corpus is tokenized exactly once. Permutations are the affine
    ``MINHASH_AB`` family over the shared per-token hash — ONE md5 per
    token total, num_hashes integer mul/add/mod lanes (pure codegen
    arithmetic; the r10-era family paid num_hashes md5 STRING hashes
    per token and dominated the stage)."""
    if num_hashes > len(MINHASH_AB):
        raise ValueError(
            f"num_hashes={num_hashes} > {len(MINHASH_AB)} pinned "
            "permutation constants (extend MINHASH_AB to widen)"
        )
    tok_rows = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(F.array_distinct(_maybe_tokens(df, text_col))).alias("tok"),
    )
    hashed = tok_rows.withColumn("h60", _token_hash60(F.col("tok")))
    h31 = F.shiftrightunsigned(F.col("h60"), 28) % F.lit(MINHASH_PRIME)
    sig_aggs = [
        F.min(
            (F.lit(a) * h31 + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return hashed.groupBy("id").agg(
        *sig_aggs, F.collect_set(F.col("h60")).alias("toks")
    )


def corpus_minhash_similarity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    num_hashes: int = 16,
) -> DataFrame:
    """[group_a, group_b, agreeing_lanes, est_jaccard]: ONE MinHash
    signature per GROUP over the group's token VOCABULARY (min per
    affine lane across every token hash the group contains), compared
    pairwise. (# agreeing lanes) / num_hashes is the standard unbiased
    estimator of the vocabulary Jaccard J(vocab_a, vocab_b) — crawl-
    snapshot / source overlap monitoring without ever materializing a
    vocabulary.

    Scale design: min-per-lane is fully map-side combinable and
    duplicate-insensitive (min over a multiset equals min over its
    set), so the corpus tokenizes in one pass and shuffles exactly
    ``num_hashes`` longs per group — no distinct, no vocabulary
    shuffle, nothing output-sized. The pair table is #groups^2
    (driver-small). Signatures persist and MERGE by plain min, so
    yesterday's corpus signature combines with today's delta for free
    (the mergeable-sketch pattern). Same Carter-Wegman family as the
    document-level minhash (MINHASH_AB over the shared 60-bit token
    hash), mirrored lane-for-lane by the SQL oracle. Null groups are
    dropped; groups pair as ``group_a < group_b`` (string order).
    """
    if num_hashes > len(MINHASH_AB):
        raise ValueError(
            f"num_hashes={num_hashes} > {len(MINHASH_AB)} pinned "
            "permutation constants (extend MINHASH_AB to widen)"
        )
    tok = df.where(F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("grp"),
        F.explode(
            F.array_distinct(word_tokens(F.col(text_col)))
        ).alias("tok"),
    )
    hashed = tok.withColumn("h60", _token_hash60(F.col("tok")))
    h31 = F.shiftrightunsigned(F.col("h60"), 28) % F.lit(MINHASH_PRIME)
    sigs = hashed.groupBy("grp").agg(
        *[
            F.min(
                (F.lit(a) * h31 + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"s{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
        ]
    )
    a = sigs.select(
        F.col("grp").alias("group_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    b = sigs.select(
        F.col("grp").alias("group_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    agree = None
    for i in range(num_hashes):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        agree = t if agree is None else agree + t
    return (
        a.crossJoin(b)
        .where(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            agree.cast("int").alias("agreeing_lanes"),
            F.round(
                agree.cast("double") / F.lit(float(num_hashes)), 6
            ).alias("est_jaccard"),
        )
    )


def _band_key_cols(num_hashes: int, bands: int) -> list[Column]:
    """Band-key expressions over a signature table's s0..s{n-1}
    (bigint lanes render as decimal strings inside the md5 — ONE md5
    per doc per band, cheap next to the per-token work)."""
    rows_per_band = num_hashes // bands
    return [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(F.concat_ws(",", *[
                F.col(f"s{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ])),
        )
        for b in range(bands)
    ]


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    broadcast_verify: bool | str = "auto",
) -> DataFrame:
    """[id1, id2, jaccard]: LSH-band candidates verified by true token-set
    Jaccard >= threshold. id1 < id2 (string order).

    ``broadcast_verify='auto'`` (default) pins the verify build side as a
    broadcast only while the input's size estimate fits
    ``BROADCAST_VERIFY_MAX_BYTES`` — the right call at bench scale, never
    at corpus scale."""
    broadcast_verify = _resolve_broadcast_verify(df, broadcast_verify)
    # band join on (id, band_key) ONLY — candidate pairs stay narrow
    # through the shuffle; token sets re-attach afterwards from the
    # (small-per-row) side table. Carrying the arrays through the
    # quadratic join would multiply shuffle bytes by avg doc length.
    #
    # sigs feeds THREE consumers (band table + both verify sides): without
    # materialization the corpus tokenize + num_hashes-way min aggregate
    # recomputes per consumer. localCheckpoint over persist() so the blocks
    # free with the frame (the embedding-blocker lesson, ADVICE r3).
    sigs = minhash_signature_table(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes
    ).localCheckpoint(eager=True)
    banded = sigs.select(
        "id", F.array(*_band_key_cols(num_hashes, bands)).alias("__bks")
    ).select("id", "__bks", F.explode("__bks").alias("band_key"))
    # explicit parallelism on the probe side: the banded table is tiny
    # (docs x bands rows) so AQE coalesces it to ~1 partition — but the
    # band join EXPLODES output quadratically per key, and that explosion
    # inherits the probe side's partitioning. Without this, the whole
    # candidate generation serializes into one task.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    l = banded.select(
        F.col("id").alias("id1"), F.col("__bks").alias("__bks1"), "band_key"
    ).repartition(parallelism, "band_key", "id1")
    r = banded.select(
        F.col("id").alias("id2"), F.col("__bks").alias("__bks2"), "band_key"
    )
    # r13: candidates distinct BY CONSTRUCTION — a pair colliding in k
    # bands is emitted k times by the band join (band keys are "b:"-
    # prefixed, so per-id arrays are duplicate-free and the shared set
    # is exactly the colliding bands); keeping only the emission at the
    # MINIMUM shared band key yields one row per candidate pair with no
    # pair-keyed repartition+dropDuplicates exchange (the TokenBlocker
    # r13 pattern; the carried 4-element band arrays ride the LINEAR
    # banded table, not the quadratic output).
    cands = (
        l.join(r, "band_key")
        .where(F.col("id1") < F.col("id2"))
        .where(
            F.col("band_key")
            == F.array_min(F.array_intersect("__bks1", "__bks2"))
        )
        .select("id1", "id2")
    )
    t1 = sigs.select(F.col("id").alias("id1"), F.col("toks").alias("toks1"))
    t2 = sigs.select(F.col("id").alias("id2"), F.col("toks").alias("toks2"))
    if broadcast_verify:
        # pin the build side: Spark's size estimate for the derived toks
        # table is unreliable here and a sort-merge join over the
        # quadratic candidate set is 5-10x slower. Disable only when the
        # per-doc token table itself exceeds executor memory.
        t1, t2 = F.broadcast(t1), F.broadcast(t2)
    return (
        cands.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("jaccard", token_set_jaccard(F.col("toks1"), F.col("toks2")))
        .where(F.col("jaccard") >= F.lit(float(jaccard_threshold)))
        .select("id1", "id2", "jaccard")
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Dedup a NEW batch of documents against an EXISTING signature
    store (the production nightly-crawl shape: the historical corpus is
    never re-read — only its persisted ``minhash_signature_table``).

    Per new-batch document: ``matched_store=1`` if its verified token
    Jaccard reaches the threshold against ANY store document; the
    remaining survivors then dedup among themselves (connected
    components over their verified pair graph, min-string-id kept).
    Output: [id, matched_store, canonical_id, kept] — ``canonical_id``
    is '' for store-matched rows, the cluster representative otherwise;
    ``kept=1`` rows are the net-new additions whose signature rows
    should be appended to the store.

    Scale shape: the store is the big side (billions of signature rows
    at 100 TB) and verification against it is INLINE at collision time
    — the store's band table carries its token sets, the batch's band
    table (bounded: a crawl increment) broadcasts WITH its token sets,
    and the Jaccard check runs inside the single map-side broadcast
    hash join. The store is therefore touched by exactly ONE
    shuffle-free pass: no candidate-pair materialization, no pair
    dropDuplicates exchange, no token re-attach join. A (new, old)
    pair colliding in k bands is verified k (<= ``bands``) times — a
    deliberate trade: re-running an O(|toks|) array intersect beats
    shuffling the candidate-pair table (measured at sf0.1: the pair
    dropDuplicates alone cost more than the whole inline plan, NOTES.md
    round-6). Skew is a non-issue on this path — hot bands fan out
    map-side inside the scan partitioning, never into an exchange.
    The only batch-sized shuffles left are the distinct on matched ids
    and the survivors' self-dedup.
    No reference counterpart (PyDI has no incremental surface);
    composes minhash_near_duplicates' audited primitives.
    """
    # Refuse pre-r11 stores loudly: the Carter-Wegman rewrite changed
    # signature lanes from md5-hex STRINGS to bigints. An old store
    # would read fine, band-collide with nothing (silent total recall
    # loss against history), and then get bigint rows appended into a
    # string-lane parquet directory — schema corruption. Rebuild the
    # store with minhash_signature_table to migrate.
    for lane in (f"s{i}" for i in range(num_hashes)):
        t = store_sigs.schema[lane].dataType.typeName()
        if t not in ("byte", "short", "integer", "long"):
            raise TypeError(
                f"incremental_minhash_dedup: store lane {lane!r} is {t}, "
                "not integral — this store was built with a pre-r11 "
                "(md5-string) signature family and CANNOT match the "
                "current Carter-Wegman lanes. Rebuild it with "
                "minhash_signature_table over the historical corpus."
            )
    parallelism = new_docs.sparkSession.sparkContext.defaultParallelism
    new_sigs = minhash_signature_table(
        new_docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes
    ).localCheckpoint(eager=True)
    band_cols = _band_key_cols(num_hashes, bands)
    # both band tables carry their token sets so the Jaccard check runs
    # inside the broadcast join itself — see the docstring trade-off
    new_band_toks = new_sigs.select(
        F.col("id").alias("new_id"),
        F.col("toks").alias("toks_new"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    store_band_toks = store_sigs.select(
        F.col("id").alias("old_id"),
        F.col("toks").alias("toks_old"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    # the quadratic fan-out is map-side, so its width is the STORE's
    # scan width. A production parquet store is already wide; a small /
    # derived store can arrive AQE-coalesced to 1 partition, which
    # serializes the whole verify (NOTES.md width lesson — measured
    # 30 s single-threaded vs 2 s wide at sf0.1). Widen only when
    # narrow: no-op at scale, round-robin (no key skew) when needed.
    if store_sigs.rdd.getNumPartitions() < parallelism:
        store_band_toks = store_band_toks.repartition(parallelism)
    matched = (
        store_band_toks.join(F.broadcast(new_band_toks), "band_key")
        # size gate first: prunes collisions on two int lengths before
        # the O(|toks|) intersect (r12; lossless — see jaccard_size_gate)
        .where(
            jaccard_size_gate(
                F.col("toks_new"), F.col("toks_old"), jaccard_threshold
            )
            & (
                token_set_jaccard(F.col("toks_new"), F.col("toks_old"))
                >= F.lit(float(jaccard_threshold))
            )
        )
        .select(F.col("new_id").alias("id"))
        .distinct()  # batch-sized: first (and only) store-path shuffle
        .localCheckpoint(eager=True)
    )
    # survivors dedup among themselves — batch-sized from here on; the
    # same inline-verify shape (both sides carry toks, one broadcast
    # band join, Jaccard in the join filter) replaces the old
    # candidates->dedup->re-attach chain and its three shuffles.
    # Duplicate (id1, id2) edges from multi-band collisions are
    # harmless: connected components is idempotent over repeated edges.
    surv = new_sigs.join(matched, "id", "left_anti").localCheckpoint(eager=True)
    sb1 = surv.select(
        F.col("id").alias("id1"),
        F.col("toks").alias("toks1"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    if surv.rdd.getNumPartitions() < parallelism:
        sb1 = sb1.repartition(parallelism)
    sb2 = surv.select(
        F.col("id").alias("id2"),
        F.col("toks").alias("toks2"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    batch_pairs = (
        sb1.join(F.broadcast(sb2), "band_key")
        .where(
            (F.col("id1") < F.col("id2"))
            & jaccard_size_gate(
                F.col("toks1"), F.col("toks2"), jaccard_threshold
            )
            & (
                token_set_jaccard(F.col("toks1"), F.col("toks2"))
                >= F.lit(float(jaccard_threshold))
            )
        )
        .select("id1", "id2")
    )
    from pydi_spark.clustering.connected_components import connected_components

    assign = connected_components(batch_pairs)
    surv_out = (
        surv.select("id")
        .join(assign.withColumnRenamed("record_id", "id"), "id", "left")
        .select(
            "id",
            F.lit(0).alias("matched_store"),
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("canonical_id"),
        )
        .withColumn(
            "kept", (F.col("id") == F.col("canonical_id")).cast("int")
        )
    )
    matched_out = matched.select(
        "id",
        F.lit(1).alias("matched_store"),
        F.lit("").alias("canonical_id"),
        F.lit(0).alias("kept"),
    )
    # Documents whose text tokenizes to ZERO tokens produce no
    # signature row (the groupBy runs over exploded tokens), so they
    # would silently vanish from both outputs (round-4 ADVICE). They
    # can never match the store or each other through a band join;
    # each survives as its own canonical. Batch-sized anti-join.
    tokenless_out = (
        new_docs.select(F.col(id_col).cast("string").alias("id"))
        .distinct()
        .join(new_sigs.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit(0).alias("matched_store"),
            F.col("id").alias("canonical_id"),
            F.lit(1).alias("kept"),
        )
    )
    return surv_out.unionByName(matched_out).unionByName(tokenless_out)


# ----------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long


def _token_hash60(t: Column) -> Column:
    """First 15 hex chars of md5 as a bigint (portable across engines)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_fingerprint(text: Column) -> Column:
    """60-bit SimHash over word tokens as a bigint Column.

    Bit positions are unrolled as literal shifts (shiftright needs a
    literal count); the token hashes array is computed once and shared.
    """
    toks = F.array_distinct(word_tokens(text))
    hashes = F.transform(toks, _token_hash60)

    def bit_at(j: int) -> Column:
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long"),
        )
        return F.when(vote >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    fp = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        fp = fp.bitwiseOR(F.shiftleft(bit_at(j), j))
    return fp


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[id, fp]: SimHash via explode + 60 native sum aggregates.

    The Column-expression variant (simhash_fingerprint) runs inside
    higher-order functions, which Spark interprets rather than
    codegen-compiles — ~10x slower per document. This shape (explode the
    tokens, one hash per row, groupBy with plain sums) stays entirely in
    whole-stage codegen with map-side partial aggregation.
    """
    toks = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(F.array_distinct(_maybe_tokens(df, text_col))).alias("tok"),
    )
    hashed = toks.withColumn("h60", _token_hash60(F.col("tok")))
    # r12: the 60 vote aggregates and the 60-term fingerprint fold are
    # built as SQL STRINGS, not Column operators — Column arithmetic
    # costs one py4j round trip per expression node (~1 ms each) and
    # this tree has ~400 nodes, so the old form spent ~1.5 s PER QUERY
    # driver-side before any job ran (the NOTES r6 kmeans lesson;
    # measured: fingerprints noop 2.97 s -> 1.4 s warm at sf0.1). The
    # generated expressions are op-for-op identical (shiftright/&/*/-
    # integer arithmetic, CASE/shiftleft/| fold), so fingerprints are
    # bit-identical — the oracle gate re-verified all nine consumers.
    vote_aggs = [
        F.expr(f"sum(CAST((shiftright(h60, {j}) & 1) * 2 - 1 AS BIGINT))").alias(
            f"v{j}"
        )
        for j in range(SIMHASH_BITS)
    ]
    votes = hashed.groupBy("id").agg(*vote_aggs)
    fp_sql = " | ".join(
        f"shiftleft(CAST(CASE WHEN v{j} >= 0 THEN 1 ELSE 0 END AS BIGINT), {j})"
        for j in range(SIMHASH_BITS)
    )
    return votes.selectExpr("id", f"CAST({fp_sql} AS BIGINT) AS fp")


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """[id1, id2, hamming]: band-trick candidates (bands of 15 bits;
    Hamming <= bands-1 guarantees a shared band) verified exactly."""
    rows = SIMHASH_BITS // bands
    # both join sides derive from the fingerprints; checkpoint so the
    # 60-sum vote aggregate runs once, not per side (see minhash note)
    base = simhash_fingerprints(df, text_col, id_col).localCheckpoint(
        eager=True
    )
    # integer band keys: (band_id << rows) | band_bits — pure codegen
    # shifts/masks, and the band join shuffles 8-byte longs instead of
    # strings (r11; band ids can't collide across bands by construction).
    # Output-invariant: banding is recall-COMPLETE for Hamming <=
    # bands-1 (pigeonhole), so the verified pair set is exactly
    # {hamming <= max_hamming} under ANY band-key representation — the
    # oracle replays fingerprints all-pairs and never sees band keys.
    banded = base.withColumn(
        "__bks",
        F.array(
            *[
                F.shiftrightunsigned(F.col("fp"), b * rows)
                .bitwiseAND(F.lit((1 << rows) - 1))
                + F.lit(b << rows)
                for b in range(bands)
            ]
        ),
    ).withColumn("band_key", F.explode("__bks"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    l = banded.select(
        F.col("id").alias("id1"), F.col("fp").alias("fp1"),
        F.col("__bks").alias("__bks1"), "band_key"
    ).repartition(parallelism, "band_key", "id1")  # see minhash note
    r = banded.select(
        F.col("id").alias("id2"), F.col("fp").alias("fp2"),
        F.col("__bks").alias("__bks2"), "band_key"
    )
    # r12 verified (hamming filter) BEFORE the pair-dedup exchange; r13
    # removes the dedup exchange entirely: band keys carry a per-band
    # prefix (b << rows), so each per-id band array is duplicate-free
    # and a pair colliding in k bands is emitted exactly k times —
    # keeping only the emission at the MINIMUM shared band key leaves
    # one row per pair (the TokenBlocker r13 pattern). The carried
    # 4-long arrays ride the LINEAR banded table; the quadratic output
    # never hits an exchange.
    return (
        l.join(r, "band_key")
        .where(F.col("id1") < F.col("id2"))
        .where(
            F.col("band_key")
            == F.array_min(F.array_intersect("__bks1", "__bks2"))
        )
        .withColumn("hamming", hamming_distance(F.col("fp1"), F.col("fp2")))
        .where(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id1", "id2", "hamming")
    )


# ----------------------------------------------------------- ngram jaccard

def _shingle_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Distinct (id, shingle-h60) rows for word ``n``-shingles;
    checkpointed (the rows feed several consumers downstream).

    Shingle generation is posexplode + window leads: whole-stage
    codegen'd, ~3x faster than the per-row transform/slice higher-order
    functions (interpreted — see NOTES.md) a literal translation would
    use. Shingles carry as 60-bit md5-prefix ints (the portable SimHash
    construction, mirrored in the oracles): the quadratic candidate
    join shuffles 8-byte keys instead of n-word strings, and set
    verification intersects longs. Collisions could only ADD candidates
    (a true near-dup pair always shares a real shingle) and exact
    verification filters those — output-identical. Short documents
    (< n tokens) contribute their whole text as the single shingle
    (reference edge case, mirrored in the oracles)."""
    from pyspark.sql import Window

    toks = _maybe_tokens(df, text_col)
    tok_rows = df.where(F.size(toks) >= n).select(
        F.col(id_col).cast("string").alias("id"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    wpos = Window.partitionBy("id").orderBy("pos")
    lead_cols = [F.lead("tok", j).over(wpos).alias(f"t{j}") for j in range(1, n)]
    with_leads = tok_rows.select("id", "tok", *lead_cols)
    sh_long = (
        with_leads.where(F.col(f"t{n - 1}").isNotNull())
        .select(
            "id",
            _token_hash60(
                F.concat_ws(" ", "tok", *[f"t{j}" for j in range(1, n)])
            ).alias("shingle"),
        )
    )
    short = df.where(F.size(toks) < n).select(
        F.col(id_col).cast("string").alias("id"),
        _token_hash60(F.array_join(toks, " ")).alias("shingle"),
    )
    exploded = sh_long.unionByName(short).dropDuplicates(["id", "shingle"])
    return exploded.localCheckpoint(eager=True)


def ngram_containment_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    containment_threshold: float = 0.8,
    max_shingle_frequency: int | None = 100,
    broadcast_verify: bool | str = "auto",
) -> DataFrame:
    """[id1, id2, containment] — asymmetric near-dup detection:
    ``containment = |A ∩ B| / min(|A|, |B|)`` over word-shingle sets
    (Broder containment, symmetrized by the smaller set).

    Jaccard misses subset duplication: a document quoted whole inside a
    10x-longer page scores ``|A|/|B| ≈ 0.1`` Jaccard but containment
    1.0. Training-data pipelines need this to catch wrapper pages,
    quote farms, and partial mirrors that survive Jaccard dedup.

    Same scale shape as :func:`ngram_jaccard_duplicates` (shingle-block
    candidates, ids-only quadratic join with explicit width, exact set
    verification behind a size-gated broadcast). The PPJoin prefix
    bound does not transfer to containment (its length bound assumes
    symmetric Jaccard), so ``max_shingle_frequency`` is the only
    candidate-pruning knob here.
    """
    broadcast_verify = _resolve_broadcast_verify(df, broadcast_verify)
    exploded = _shingle_rows(df, text_col, id_col, shingle_size)
    base = exploded.groupBy("id").agg(F.collect_list("shingle").alias("sh"))
    if max_shingle_frequency:
        freq_keep = (
            exploded.groupBy("shingle").count()
            .where(F.col("count") <= max_shingle_frequency)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(freq_keep), "shingle", "left_semi")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    l = exploded.select(F.col("id").alias("id1"), "shingle").repartition(
        parallelism, "shingle", "id1"
    )
    r = exploded.select(F.col("id").alias("id2"), "shingle")
    raw = l.join(r, "shingle").where(F.col("id1") < F.col("id2")).select(
        "id1", "id2"
    )
    s1 = base.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    containment = inter / F.least(F.size("sh1"), F.size("sh2"))
    if broadcast_verify:
        # verify before the pair-dedup exchange — see the jaccard twin
        # (containment is constant per pair, so filter/dedup commute
        # and only surviving pairs reach the dedup exchange). r13,
        # UNPRUNED path: min-shared-shingle emission filter replaces
        # the dedup exchange outright (see the jaccard twin for why
        # pruned paths cannot).
        if not max_shingle_frequency:
            raw_sh = l.join(r, "shingle").where(
                F.col("id1") < F.col("id2")
            ).select("id1", "id2", "shingle")
            return (
                raw_sh.join(F.broadcast(s1), "id1")
                .join(F.broadcast(s2), "id2")
                .where(
                    F.col("shingle")
                    == F.array_min(F.array_intersect("sh1", "sh2"))
                )
                .withColumn("containment", containment)
                .where(
                    F.col("containment") >= F.lit(float(containment_threshold))
                )
                .select("id1", "id2", "containment")
            )
        return (
            raw.join(F.broadcast(s1), "id1")
            .join(F.broadcast(s2), "id2")
            .withColumn("containment", containment)
            .where(
                F.col("containment") >= F.lit(float(containment_threshold))
            )
            .select("id1", "id2", "containment")
            .dropDuplicates(["id1", "id2"])
        )
    cands = raw.repartition(parallelism, "id1", "id2").dropDuplicates(
        ["id1", "id2"]
    )
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("containment", containment)
        .where(F.col("containment") >= F.lit(float(containment_threshold)))
        .select("id1", "id2", "containment")
    )


def ngram_jaccard_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    jaccard_threshold: float = 0.5,
    max_shingle_frequency: int | None = 100,
    broadcast_verify: bool | str = "auto",
    prefix_filter: bool = False,
) -> DataFrame:
    """[id1, id2, jaccard] over word-shingle sets: shingle-block
    candidates verified with exact set Jaccard.

    ``prefix_filter`` applies the PPJoin prefix principle:
    under any global shingle ordering, two sets with Jaccard >= t must
    share an element within each set's first ``|x| - ceil(t*|x|) + 1``
    shingles. Ordering rarest-first means the head (template) shingles —
    the ones that explode the candidate join quadratically — fall in the
    suffixes and never generate candidates, while the verified result
    set is provably identical. ``max_shingle_frequency`` remains the
    lossy knob on top (drops hot shingles from candidate generation
    entirely). ``broadcast_verify`` as in
    :func:`minhash_near_duplicates`."""
    broadcast_verify = _resolve_broadcast_verify(df, broadcast_verify)
    # shared shingle generation (_shingle_rows): checkpointed because
    # the rows feed up to FOUR consumers here (set re-attach, hot-
    # shingle count, its semi-join, candidate generation)
    exploded = _shingle_rows(df, text_col, id_col, shingle_size)
    base = exploded.groupBy("id").agg(F.collect_list("shingle").alias("sh"))
    if max_shingle_frequency:
        freq_keep = (
            exploded.groupBy("shingle").count()
            .where(F.col("count") <= max_shingle_frequency)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(freq_keep), "shingle", "left_semi")
    if prefix_filter:
        from pyspark.sql import Window

        freq = exploded.groupBy("shingle").agg(F.count("*").alias("__freq"))
        doc_len = exploded.groupBy("id").agg(F.count("*").alias("__len"))
        wid = Window.partitionBy("id").orderBy("__freq", "shingle")
        t = float(jaccard_threshold)
        cand_rows = (
            exploded.join(freq, "shingle")
            .withColumn("__rk", F.row_number().over(wid))
            .join(doc_len, "id")
            .where(
                F.col("__rk")
                <= F.col("__len") - F.ceil(F.lit(t) * F.col("__len")) + 1
            )
            .select("id", "shingle")
        )
    else:
        cand_rows = exploded
    # ids-only candidate join (narrow shuffle), shingle sets re-attached
    # for verification afterwards; probe side explicitly repartitioned
    # (quadratic join output inherits probe partitioning — see minhash)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    l = cand_rows.select(F.col("id").alias("id1"), "shingle").repartition(
        parallelism, "shingle", "id1"
    )
    r = cand_rows.select(F.col("id").alias("id2"), "shingle")
    raw = l.join(r, "shingle").where(F.col("id1") < F.col("id2")).select(
        "id1", "id2"
    )
    s1 = base.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    jaccard = token_set_jaccard(F.col("sh1"), F.col("sh2"))
    size_gate = jaccard_size_gate(
        F.col("sh1"), F.col("sh2"), jaccard_threshold
    )
    if broadcast_verify:
        # verify BEFORE the pair-dedup exchange (the simhash r12 rule:
        # jaccard is constant per pair, so filter/dedup commute): both
        # set joins are map-side broadcasts inside the candidate join's
        # partitioning, and the dedup exchange then moves only the
        # SURVIVING pairs instead of every shingle collision. A pair
        # colliding in k shingles is verified k times — at the measured
        # ~12% multi-collision rate that re-intersect is far cheaper
        # than shuffling the full candidate set twice (repartition +
        # dedup) as the r12-before shape did. The size gate prunes
        # candidates on two int lengths before any array intersect.
        #
        # r13, UNPRUNED path only: the dedup exchange disappears too.
        # With no hot-shingle prune and no prefix filter, a pair is
        # emitted once per SHARED shingle, and the shared set is
        # exactly array_intersect(sh1, sh2) — already attached for the
        # Jaccard — so keeping only the emission at the minimum shared
        # shingle leaves one row per pair (TokenBlocker r13 pattern).
        # Pruned paths keep dropDuplicates: pruning removes emissions
        # but not array members, so the min could name a never-emitted
        # shingle and silently drop the pair.
        unpruned = not max_shingle_frequency and not prefix_filter
        if unpruned:
            raw = l.join(r, "shingle").where(
                F.col("id1") < F.col("id2")
            ).select("id1", "id2", "shingle")
        out = (
            raw.join(F.broadcast(s1), "id1")
            .join(F.broadcast(s2), "id2")
            .where(size_gate)
        )
        if unpruned:
            return (
                out.where(
                    F.col("shingle")
                    == F.array_min(F.array_intersect("sh1", "sh2"))
                )
                .withColumn("jaccard", jaccard)
                .where(F.col("jaccard") >= F.lit(float(jaccard_threshold)))
                .select("id1", "id2", "jaccard")
            )
        return (
            out.withColumn("jaccard", jaccard)
            .where(F.col("jaccard") >= F.lit(float(jaccard_threshold)))
            .select("id1", "id2", "jaccard")
            .dropDuplicates(["id1", "id2"])
        )
    # corpus scale (no broadcast): the verify joins shuffle by id, so
    # dedup FIRST — shuffling raw collisions with their attached
    # shingle arrays would multiply the exchange bytes by doc length.
    # Explicit width before the dedup: repartition by (id1, id2)
    # satisfies dropDuplicates' distribution requirement, so the dedup
    # aggregate and the verify stage behind it run at full parallelism
    # instead of on an AQE-coalesced handful of tasks.
    cands = raw.repartition(parallelism, "id1", "id2").dropDuplicates(
        ["id1", "id2"]
    )
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .where(size_gate)
        .withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= F.lit(float(jaccard_threshold)))
        .select("id1", "id2", "jaccard")
    )


# ------------------------------------------------------- embedding cosine

def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    method: str = "lsh",
) -> DataFrame:
    """[id1, id2, cosine]: near-dup pairs by embedding cosine similarity."""
    from pydi_spark.blocking.embedding import EmbeddingBlocker

    blocker = EmbeddingBlocker(
        vector_column=vec_col, method=method, threshold=threshold, top_k=1000
    )
    pairs = blocker.block(df, df, id_column=id_col)
    return pairs.select("id1", "id2", F.col("score").alias("cosine"))


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    n_centroids: int | None = None,
    sample_size: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """[cell, id1, id2, cosine]: SemDeDup-style cluster-scoped embedding
    near-dup pairs (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"). Vectors are assigned
    to their nearest centroid and pairwise cosine runs only WITHIN a
    cluster — the cross-cluster quadratic term is never materialized.
    Compose with ``canonical_corpus`` to keep one representative per
    duplicate group (deterministic min-id convention, like the other
    pair generators here).

    ``centroids``: pre-trained cluster centres (list of float lists) —
    the common production shape where centroids come from an offline
    k-means. ``None`` trains driver-side k-means on a sample (the IVF
    path, ``auto_n_centroids`` ~sqrt(n)).

    Scale design: the centroid table is tiny and broadcast; assignment
    is a broadcast nested-loop scored by the native cosine expression
    and pruned by a per-vector rank-1 window (one shuffle of n*k narrow
    rows). The per-cell self-join is explicitly repartitioned on
    (cell, id1) before the quadratic stage so AQE cannot serialize it,
    and with ~sqrt(n) cells the expected per-cell population keeps the
    join near-linear. No driver state beyond the centroids.
    """
    from pyspark.sql import Window

    from pydi_spark.llmdata.similarity import (
        _kmeans_centroids,
        auto_n_centroids,
        cosine_expr,
    )

    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    if centroids is None:
        n = df.count()
        k = n_centroids or auto_n_centroids(n)
        C = _kmeans_centroids(df, vec_col, k, sample_size, seed, n_rows=n)
        centroids = [[float(x) for x in row] for row in C]
    cent = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, cvec array<double>",
        )
    )
    base = df.select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    scored = base.crossJoin(cent).withColumn(
        "__cos", cosine_expr(F.col("vec"), F.col("cvec"))
    )
    w = Window.partitionBy("rid").orderBy(F.desc("__cos"), F.col("cell"))
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("rid", "vec", "cell")
    )
    left = assigned.select(
        "cell", F.col("rid").alias("id1"), F.col("vec").alias("v1")
    ).repartition(parallelism, "cell", "id1")
    right = assigned.select(
        "cell", F.col("rid").alias("id2"), F.col("vec").alias("v2")
    )
    return (
        left.join(right, "cell")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine_expr(F.col("v1"), F.col("v2")))
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("cell", "id1", "id2", "cosine")
    )


def canonical_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse a near-duplicate pair set into a canonical corpus: the
    pipeline-completing step after any pair generator (minhash, simhash,
    n-gram Jaccard, embedding). Connected components over the pair graph
    give each document a ``canonical_id`` (the min string-ordered id of
    its duplicate cluster, itself when unpaired); ``is_canonical`` marks
    the single kept row per cluster — ``.where("is_canonical")`` is the
    deduplicated corpus. No reference counterpart (PyDI stops at pair
    lists); north-star training-data op.

    Scale design: the pair graph is ids-only (narrow), clustered with the
    auto hybrid/large-star CC; the corpus is touched exactly once, by a
    single left join on the id — duplicate clusters are a small fraction
    of the corpus, so the assignment side is typically broadcast-sized,
    and the corpus itself is never shuffled.
    """
    from pydi_spark.clustering.connected_components import connected_components

    assign = connected_components(pairs.select("id1", "id2"))
    out = df.join(
        assign.withColumnRenamed("record_id", "__rid"),
        F.col(id_col).cast("string") == F.col("__rid"),
        "left",
    ).drop("__rid")
    canonical = F.coalesce(
        F.col("cluster_id"), F.col(id_col).cast("string")
    )
    return out.select(
        *[F.col(c) for c in df.columns],
        canonical.alias("canonical_id"),
        (F.col(id_col).cast("string") == canonical).alias("is_canonical"),
    )


def keep_best_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware duplicate collapse: like ``canonical_corpus`` but
    the kept row per duplicate cluster is the HIGHEST-``score_col``
    document under the strict (score DESC, id ASC) total order, not the
    min-id one — the production rule when near-dups differ in quality
    (keep the cleanest crawl of a page, not the lexicographically
    first). Output: input columns + ``cluster_id`` (min-id cluster
    label, stable across score changes) + ``keep_id`` + ``is_kept``
    (int; ``.where("is_kept = 1")`` is the deduplicated corpus).

    Scale design: pair graph ids-only through CC; winners are one
    map-side-combinable min_by aggregate over the clustered slice
    (struct total order makes min_by's first-found tie rule
    deterministic — the tpch_q2 trick with the score negated); the
    corpus is touched by two narrow id joins, never shuffled by
    content. No reference counterpart — north-star addition.
    """
    from pydi_spark.clustering.connected_components import (
        connected_components,
    )

    sid = F.col(id_col).cast("string")
    assign = connected_components(pairs.select("id1", "id2"))
    scored = df.select(
        sid.alias("__rid"), F.col(score_col).cast("double").alias("__sc")
    ).join(assign.withColumnRenamed("record_id", "__rid"), "__rid")
    winners = scored.groupBy("cluster_id").agg(
        F.min_by(
            "__rid", F.struct((-F.col("__sc")).alias("s"), F.col("__rid"))
        ).alias("__keep")
    )
    out = (
        df.join(
            assign.withColumnRenamed("record_id", "__rid"),
            sid == F.col("__rid"),
            "left",
        )
        .drop("__rid")
        .join(winners, "cluster_id", "left")
    )
    canonical = F.coalesce(F.col("cluster_id"), sid)
    keep = F.coalesce(F.col("__keep"), sid)
    return out.select(
        *[F.col(c) for c in df.columns],
        canonical.alias("cluster_id"),
        keep.alias("keep_id"),
        (sid == keep).cast("int").alias("is_kept"),
    )


def dedup_method_agreement(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_params: dict | None = None,
    simhash_params: dict | None = None,
    ngram_params: dict | None = None,
) -> DataFrame:
    """[minhash, simhash, ngram, n_pairs] — the agreement matrix across
    the three text near-dup pair generators: how many verified pairs
    each subset of methods finds. The method-selection diagnostic a
    corpus engineer runs on a sample before committing a 100 TB pass
    (near-identical corpora: all three agree; templated corpora:
    simhash diverges; short docs: ngram diverges).

    Each generator runs its own audited banded pipeline; the agreement
    join operates on pair KEYS only (narrow), and the output is at most
    7 rows. Run on a sample at corpus scale — three full passes over
    100 TB is a deliberate decision, not a default."""
    # Each generator's output is distinct on (id1, id2) (each ends in a
    # pair dedup), so the presence-flag matrix is a tagged UNION + one
    # max-aggregate — not the two full-outer joins a literal reading
    # suggests. Full outer cannot broadcast either side, so the join
    # form sort-merge-joined the multi-million-row minhash pair set
    # twice; the union form shuffles each pair exactly once into a hash
    # aggregate, no sorts (measured r12: 11.9 -> ~9.7 s at sf0.1, and
    # two SMJ barriers fewer at any scale).
    def _tagged(pairs: DataFrame, m: int, s: int, n: int) -> DataFrame:
        return pairs.select(
            "id1",
            "id2",
            F.lit(m).alias("minhash"),
            F.lit(s).alias("simhash"),
            F.lit(n).alias("ngram"),
        )

    # r13: tokenize the corpus ONCE. All three generators start from
    # word_tokens(text) — minhash and simhash over the distinct token
    # set, ngram over the positional sequence — so the scan + regex
    # split (the shared prefix of all three pipelines) runs a single
    # time into a checkpointed [id, tokens] frame and each generator
    # consumes the array (guide §2.4: one pass for shared work; VERDICT
    # r12 #3). The broadcast-verify gate is resolved on the ORIGINAL
    # relation — the checkpointed frame has no size estimate and would
    # spuriously fail every generator toward the shuffling verify path.
    base = df.select(
        F.col(id_col).cast("string").alias("__id"),
        word_tokens(F.col(text_col)).alias("__toks"),
    ).localCheckpoint(eager=True)
    bv = _resolve_broadcast_verify(df, "auto")
    mh_params = dict(minhash_params or {})
    mh_params.setdefault("broadcast_verify", bv)
    ng_params = dict(ngram_params or {})
    ng_params.setdefault("broadcast_verify", bv)
    mh = _tagged(
        minhash_near_duplicates(
            base, text_col="__toks", id_col="__id", **mh_params
        ), 1, 0, 0,
    )
    sh = _tagged(
        simhash_near_duplicates(
            base, text_col="__toks", id_col="__id", **(simhash_params or {})
        ), 0, 1, 0,
    )
    ng = _tagged(
        ngram_jaccard_duplicates(
            base, text_col="__toks", id_col="__id", **ng_params
        ), 0, 0, 1,
    )
    flags = (
        mh.unionByName(sh)
        .unionByName(ng)
        .groupBy("id1", "id2")
        .agg(
            F.max("minhash").alias("minhash"),
            F.max("simhash").alias("simhash"),
            F.max("ngram").alias("ngram"),
        )
    )
    return flags.groupBy("minhash", "simhash", "ngram").agg(
        F.count("*").alias("n_pairs")
    )


# ------------------------------------------------------------- LSH tuning

def lsh_candidate_probability(
    jaccard: float, num_hashes: int = 16, bands: int = 4
) -> float:
    """P(a pair with this true Jaccard becomes an LSH candidate) under
    the banding scheme: ``1 - (1 - s^r)^b`` with ``r = num_hashes //
    bands`` rows per band (Leskovec et al., MMDS ch. 3). The operating
    knob at corpus scale: candidates cost (verify joins), misses cost
    recall — size bands so the S-curve's threshold sits at the target
    Jaccard before running a 100 TB pass."""
    r = num_hashes // bands
    s = min(max(float(jaccard), 0.0), 1.0)
    return 1.0 - (1.0 - s ** r) ** bands


def suggest_bands(
    threshold: float, num_hashes: int = 16, min_recall: float = 0.9
) -> int:
    """Smallest band count (most selective ⇒ fewest candidates) whose
    S-curve still catches pairs AT the threshold with ``min_recall``
    probability. Raises if no divisor of ``num_hashes`` achieves it —
    then ``num_hashes`` itself must grow."""
    divisors = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    # fewer bands (more rows per band) = more selective; walk from the
    # most selective up until recall at the threshold is met
    for b in divisors:
        if lsh_candidate_probability(threshold, num_hashes, b) >= min_recall:
            return b
    raise ValueError(
        f"no banding of {num_hashes} hashes reaches recall "
        f"{min_recall} at jaccard {threshold}; increase num_hashes"
    )


def lsh_recall_probe(
    df: DataFrame,
    sample_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """EMPIRICAL banding S-curve: on a deterministic md5-ordered sample
    of ``sample_k`` documents, compute exact all-pairs token Jaccard
    and whether each pair would be an LSH band candidate, bucketed by
    Jaccard decile — the measured counterpart of
    :func:`lsh_candidate_probability`'s theory curve. Run this before
    committing a (num_hashes, bands) choice to a full-corpus pass: the
    theory assumes idealized min-wise hashing; the probe shows what
    THIS corpus' token distributions actually get.

    Output: [bucket, n_pairs, n_candidates, recall_ppm] where bucket =
    floor(jaccard*10) (10 = exact duplicates) and recall_ppm is the
    exact integer (1e6 * candidates) div pairs.

    Scale: everything after the sort+limit sample is sample-sized —
    the all-pairs cross join is k^2/2 rows by design (k defaults to
    100 -> 4,950 pairs), never corpus-sized.
    """
    sample = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
    ).orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col).cast("string")) \
     .limit(int(sample_k))
    st = minhash_signature_table(
        sample, text_col="text", id_col="id", num_hashes=num_hashes
    ).withColumn(
        "bk", F.array(*_band_key_cols(num_hashes, bands))
    ).localCheckpoint(eager=True)
    a = st.select(F.col("id").alias("id1"), F.col("toks").alias("toks1"),
                  F.col("bk").alias("bk1"))
    b = st.select(F.col("id").alias("id2"), F.col("toks").alias("toks2"),
                  F.col("bk").alias("bk2"))
    pairs = (
        a.crossJoin(b)  # sample-sized by construction (k^2)
        .where(F.col("id1") < F.col("id2"))
        .select(
            F.floor(
                token_set_jaccard(F.col("toks1"), F.col("toks2")) * 10.0
            ).cast("int").alias("bucket"),
            F.arrays_overlap(F.col("bk1"), F.col("bk2"))
            .cast("int").alias("cand"),
        )
    )
    out = pairs.groupBy("bucket").agg(
        F.count("*").alias("n_pairs"),
        F.sum("cand").alias("n_candidates"),
    )
    return out.select(
        "bucket", "n_pairs", "n_candidates",
        F.expr("(1000000 * n_candidates) div n_pairs").alias("recall_ppm"),
    )
