"""Physical-plan proofs of the 100 TB scale paths SCALE.md promises:
partition pruning on partitioned writes, exchange-free bucketed joins,
and filter pushdown to parquet scans."""

import pytest


def _plan(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_partitioned_write_prunes(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_by_priority")
    orders.write.partitionBy("o_orderpriority").parquet(path)
    back = spark.read.parquet(path).where("o_orderpriority = '1-URGENT'")
    plan = _plan(back)
    # the filter must become a partition filter on the scan, not a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    n_all = orders.where("o_orderpriority = '1-URGENT'").count()
    assert back.count() == n_all


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where("l_quantity < 5").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # predicate reaches the scan and the schema is pruned to 2 columns
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1].split("\n")[0]
    assert "LessThan(l_quantity" in pushed
    read_schema = plan.split("ReadSchema", 1)[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert read_schema.count(",") == 1  # exactly two columns scanned


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # tables land in the session's spark-warehouse (gitignored)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("t_cust_b")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("t_ord_b")
    a = spark.table("t_cust_b")
    b = spark.table("t_ord_b")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a["c_custkey"] == b["o_custkey"]).select(
            "c_custkey", "o_orderkey"
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")
