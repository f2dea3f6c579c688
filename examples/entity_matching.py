"""End-to-end entity matching + fusion demo on the synthetic testdata.

Mirrors the reference tutorial's flagship flow (block -> match ->
evaluate -> 1:1 -> cluster -> fuse) on the supplier/customer tables.

    python3 examples/entity_matching.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import Dataset, get_spark  # noqa: E402
from pydi_spark.blocking import StandardBlocker, block_stats  # noqa: E402
from pydi_spark.clustering import StableMatcher, connected_components  # noqa: E402
from pydi_spark.functions.comparators import NumericComparator  # noqa: E402
from pydi_spark.functions.utils import jaccard  # noqa: E402
from pydi_spark.fusion import DataFusionEngine, DataFusionStrategy  # noqa: E402
from pydi_spark.io import load_parquet  # noqa: E402
from pydi_spark.matching import RuleBasedMatcher  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-em")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load with provenance + trust
    supp = load_parquet(spark, f"{sf_dir}/supplier.parquet", "supplier", trust_score=0.9)
    cust = load_parquet(spark, f"{sf_dir}/customer.parquet", "customer", trust_score=0.6)
    supp = supp.with_df(
        supp.df.select(
            F.col("s_suppkey").alias("rid"), F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("bal"), F.col("s_nationkey").alias("nation"),
        )
    )
    cust = cust.with_df(
        cust.df.select(
            F.col("c_custkey").alias("rid"), F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"), F.col("c_nationkey").alias("nation"),
        )
    )

    # 2. blocking (hash equi-join) + stats
    pairs = StandardBlocker(on=["nation"]).block(supp.df, cust.df, id_column="rid")
    print("candidate pairs:", pairs.count())
    block_stats(pairs).orderBy(F.desc("pair_count")).show(5)

    # 2b. meta-blocking (SparkER-style): weight the blocking graph by
    # Jaccard of block sets and prune per-node — the candidate-taming
    # stage a corpus-scale pipeline inserts before matching
    from pydi_spark.blocking import meta_blocking

    assignments = supp.df.select(
        F.concat(F.lit("s"), F.col("rid")).alias("rid"), F.col("nation").alias("block_key")
    ).unionByName(cust.df.select(
        F.concat(F.lit("c"), F.col("rid")).alias("rid"), F.col("nation").alias("block_key")
    ))
    pruned = meta_blocking(
        assignments, weighting="js", pruning="cnp", top_k=20
    ).where(  # keep the cross-source edges (the dirty-ER graph also
        # scores supplier-supplier / customer-customer pairs)
        F.substring("id1", 1, 1) != F.substring("id2", 1, 1)
    )
    print("meta-blocking kept:", pruned.count(),
          "cross-source pairs of", pairs.count())

    # 3. rule-based matching (weighted column expressions)
    matcher = RuleBasedMatcher(
        comparators=[(jaccard("name"), 0.3),
                     (NumericComparator("bal", max_difference=2000.0), 0.7)]
    )
    corr = matcher.match(supp.df, cust.df, pairs, threshold=0.6, id_column="rid")
    print("correspondences:", corr.count())

    # 4. 1:1 refinement + clustering
    one2one = StableMatcher().cluster(corr)
    clusters = connected_components(one2one.select("id1", "id2"))
    print("1:1 matches:", one2one.count(), "clusters:",
          clusters.select("cluster_id").distinct().count())

    # 5. fusion
    supp_ds = Dataset.wrap(supp.df, "supplier", id_column="rid", trust_score=0.9)
    cust_ds = Dataset.wrap(cust.df, "customer", id_column="rid", trust_score=0.6)
    strat = (
        DataFusionStrategy()
        .add_attribute_fuser("name", "longest_string")
        .add_attribute_fuser("bal", "average")
        .add_attribute_fuser("nation", "prefer_higher_trust")
    )
    fused = DataFusionEngine(strat, include_singletons=False).run(
        [supp_ds, cust_ds], one2one
    )
    fused.select("_id", "name", "bal", "_fusion_sources").show(5, truncate=False)

    # 6. master-table maintenance: apply a CDC batch to the fused
    # entities (last-writer-wins; no transactional table format needed)
    from pydi_spark.io import apply_changes

    master = fused.select("_id", "name", "bal")
    changes = (
        master.limit(3)
        .select(
            "_id",
            F.concat(F.col("name"), F.lit(" (verified)")).alias("name"),
            (F.col("bal") + F.lit(1.0)).alias("bal"),
            F.lit(1).cast("long").alias("version"),
            F.lit("U").alias("op"),
        )
    )
    maintained = apply_changes(master, changes, key_col="_id")
    print("master rows after CDC batch:", maintained.count())


if __name__ == "__main__":
    main()
