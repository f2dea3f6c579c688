"""Graph signals over document-similarity graphs.

North-star: quality propagation over near-dup / citation / host graphs
(the CommonCrawl-style centrality prior a corpus-quality pipeline feeds
into sampling weights). The reference has no graph surface.

Determinism contract: ranks are integer MICRO-units end to end —
``rank' = (1e6 - d_ppm) ... + (d_ppm * Σ(rank div deg)) div 1e6`` with
integral division everywhere — so every iteration is an order-free
integer aggregate, bit-portable across engines and partitionings (the
float power iteration would accumulate in shuffle order). The price is
a deterministic rounding-down bias of < 1 micro-unit per term per
iteration — irrelevant for ranking, essential for the oracle gate.

Scale shape: one iteration = one join of the edge list with the rank
table (both shuffled by source id, co-partitioned across iterations)
plus one map-side-combined aggregate by destination. State is one row
per node; lineage is cut every other iteration (localCheckpoint) so
the plan never deepens — the same discipline as distributed CC's
star-contraction rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_micro(
    edges: DataFrame,
    n_iter: int = 5,
    damping_ppm: int = 850_000,
    id1_col: str = "id1",
    id2_col: str = "id2",
    checkpoint_every: int = 2,
) -> DataFrame:
    """[id, rank_micro] — PageRank over the UNDIRECTED graph given as a
    pair list (edges are symmetrized; nodes = every id appearing in an
    edge). rank_micro starts at 1,000,000 per node; after each
    iteration Σ rank stays ≈ n×1e6 (minus the documented floor bias).
    """
    sym = edges.select(
        F.col(id1_col).cast("string").alias("s"),
        F.col(id2_col).cast("string").alias("d"),
    )
    sym = sym.unionByName(sym.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.localCheckpoint(eager=True)  # reused every iteration
    deg = sym.groupBy("s").agg(F.count("*").alias("deg"))
    src = sym.join(deg, "s")  # (s, d, deg) — the static iteration input
    src = src.localCheckpoint(eager=True)
    nodes = sym.select(F.col("s").alias("id")).distinct().localCheckpoint(eager=True)

    base = int(MICRO - damping_ppm)
    ranks = nodes.select("id", F.lit(MICRO).cast("bigint").alias("rank_micro"))
    for i in range(int(n_iter)):
        contrib = (
            src.join(ranks.withColumnRenamed("id", "s"), "s")
            .select(
                F.col("d").alias("id"),
                F.expr("rank_micro div deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("S"))
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.expr(
                    f"CAST({int(damping_ppm)} AS BIGINT)"
                    f" * coalesce(S, CAST(0 AS BIGINT)) div {MICRO}"
                )
            ).cast("bigint").alias("rank_micro"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(
    edges: DataFrame, id1: str = "id1", id2: str = "id2"
) -> DataFrame:
    """[n_triangles] — EXACT global triangle count of the undirected
    graph (self-loops dropped, duplicate/reversed edges collapsed).

    Scale design (the canonical degree-ordered orientation): orient
    every edge from its lower endpoint to its higher under the
    (degree, id) TOTAL order. Each triangle then has exactly ONE wedge
    u->v, u->w with a closing oriented edge v->w, so a single
    wedge-join + edge semi-join counts it once — no 3-way symmetric
    join, no /6 correction. The orientation bounds every node's
    out-degree by O(sqrt(m)) on any graph (arboricity bound), so wedge
    volume is O(m^1.5) worst case and far less on real degree-skewed
    graphs — hot hubs become wedge SINKS, not sources. Two shuffles:
    wedge build (by source) + closure semi-join (by wedge endpoints).

    No reference counterpart (PyDI has no graph analytics) — the
    community/cohesion diagnostic next to pagerank_micro.
    """
    e = (
        edges.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    # orient low (deg, id) -> high (deg, id)
    oriented = (
        e.join(da, "a").join(db, "b").select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            ).otherwise(F.col("b")).alias("src"),
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.col("b"),
            ).otherwise(F.col("a")).alias("dst"),
        )
    )
    l = oriented.select(F.col("src"), F.col("dst").alias("v"))
    r = oriented.select(F.col("src"), F.col("dst").alias("w"))
    wedges = l.join(r, "src").where(F.col("v") < F.col("w"))
    # a closing oriented edge may run v->w or w->v depending on degrees
    closing = oriented.select(
        F.least("src", "dst").alias("v"), F.greatest("src", "dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
