"""Distributed Lloyd k-means over an embedding column — exact
integer-micro arithmetic, so every step is deterministic and
SQL-replayable.

`train_pq_codebooks`/IVF already do *sampled, driver-side* k-means (the
classic train-on-sample/broadcast pattern). This module is the
complementary *full-corpus, distributed* path: each Lloyd iteration is
ONE map-side-combinable aggregation (k x (dim+1) longs), the k x dim
centroid table rides the driver<->executor boundary as plain literals,
and the corpus itself never shuffles. That is the 100 TB shape: an
iteration costs a single scan + a k-row aggregate, regardless of row
count.

Determinism contract (NOTES.md float policy): vectors quantize ONCE to
micro units (``floor(double(v) * 1e6)`` — exact in both engines),
centroids round to the nearest micro unit after each mean
(``floor((2*S + n) / (2*n))`` — computed with Python big-ints
driver-side, replayed with exact-at-test-scale doubles in SQL), and
distances are exact bigint sums of squared micro differences, so the
argmin (ties -> lowest cluster id) is a total order with NO float
summation anywhere. Quantizing centroids to 1e-6 is a documented
semantic choice, not an implementation leak — it is what makes the
operator cross-engine reproducible.

No reference counterpart (PyDI has no clustering over embeddings) —
north-star op for corpus bucketing / SemDeDup-style pre-partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _micro_cols(df: DataFrame, id_col: str, vec_col: str, dim: int):
    # expressions built as ONE selectExpr string list: the k*dim-wide
    # trees here and in _assign would otherwise cost hundreds of py4j
    # round-trips per call (~seconds of pure driver chatter)
    return df.selectExpr(
        f"{id_col} AS id",
        *[
            f"CAST(floor(CAST({vec_col}[{d}] AS DOUBLE) * {MICRO}) "
            f"AS BIGINT) AS __v{d}"
            for d in range(dim)
        ],
    )


def _assign(base: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """[id, cluster, dist2] under literal micro centroids: dist2 is the
    exact bigint sum of squared micro diffs; argmin ties break to the
    lowest cluster index (array_position finds the FIRST minimum)."""
    sums = [
        " + ".join(
            f"(__v{d} - ({int(m[d])}L)) * (__v{d} - ({int(m[d])}L))"
            for d in range(len(m))
        )
        for m in centroids
    ]
    dists = "array(" + ", ".join(sums) + ")"
    return base.selectExpr(
        *base.columns,
        f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT) "
        "AS cluster",
        f"array_min({dists}) AS dist2",
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Fit micro-int centroids: init = the vectors of the ``k`` lowest
    ids (deterministic, no RNG), then ``n_iter`` Lloyd updates. A
    cluster that loses every member keeps its previous centroid.
    Returns k x dim nested lists of micro ints (feed to
    :func:`kmeans_assign`, or to SQL as literals).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0: {n_iter}")
    # null vectors are ignored for fitting (kmeans_assign leaves them
    # with NULL cluster/dist2 — null arithmetic propagates naturally)
    df = df.where(F.col(vec_col).isNotNull())
    first = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if first is None:
        raise ValueError(
            "cannot fit k-means on an empty input (or all-null vectors)"
        )
    dim = int(first["n"])
    base = _micro_cols(df, id_col, vec_col, dim)
    seeds = base.orderBy("id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)}-row corpus")
    cents = [[int(r[f"__v{d}"]) for d in range(dim)] for r in seeds]
    for _ in range(n_iter):
        agg = (
            _assign(base, cents)
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(f"__v{d}").alias(f"__s{d}") for d in range(dim)],
            )
            .collect()
        )
        for row in agg:
            j, n = int(row["cluster"]), int(row["__n"])
            # nearest-micro rounding, exact for any magnitude: Python
            # ints, floor division == mathematical floor
            cents[j] = [
                (2 * int(row[f"__s{d}"]) + n) // (2 * n) for d in range(dim)
            ]
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, cluster, dist2] — nearest micro-centroid per vector (exact
    bigint dist2 in squared-micro units)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    base = _micro_cols(df, id_col, vec_col, len(centroids[0]))
    return _assign(base, centroids).select("id", "cluster", "dist2")


def kmeans_cluster(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: [id, cluster, dist2]."""
    cents = kmeans_fit(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    return kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
