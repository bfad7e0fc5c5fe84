"""Multi-tenant isolation — the reference's flagship workload: a
single-tenant query (WHERE tenant_id = X) must touch exactly one
shard, never the whole table (↔ router planner,
src/backend/distributed/planner/multi_router_planner.c: queries fully
scoped to one distribution-key value route to a single worker).

The Spark analog: a tenant-partitioned layout + Catalyst partition
pruning. The plan gate asserts the scan carries partition filters and
reads exactly the one matching directory."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _scan_node(plan: str) -> str:
    for line in plan.split("\n"):
        if "FileScan" in line:
            return line
    return plan


def test_single_tenant_query_prunes_to_one_partition(spark, tmp_path):
    path = str(tmp_path / "orders_by_tenant")
    (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .withColumn("tenant", (F.col("o_custkey") % 8).cast("int"))
        .write.partitionBy("tenant")
        .parquet(path)
    )

    q = (
        spark.read.parquet(path)
        .filter(F.col("tenant") == 3)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = _scan_node(plan)
    # partition filter must reach the scan (pruning, not post-filter)
    assert "PartitionFilters" in scan and "tenant" in scan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    # layout sanity: multiple tenant directories exist, so the filter
    # had something to prune (inputFiles() reports the unpruned
    # relation, so the gate is the PartitionFilters entry above —
    # Catalyst prunes the file index from exactly those filters)
    import os

    tenant_dirs = [d for d in os.listdir(path) if d.startswith("tenant=")]
    assert len(tenant_dirs) == 8

    # correctness: identical to the unpartitioned filter
    want = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .filter((F.col("o_custkey") % 8) == 3)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, q.select("o_orderstatus", "n").collect())) == sorted(
        map(tuple, want.collect())
    )


def test_tenant_in_list_prunes_partitions(spark, tmp_path):
    """IN-list tenant scoping carries the IN predicate as a partition
    filter — the reference's router handles = and IN the same way."""
    path = str(tmp_path / "orders_by_tenant2")
    (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .withColumn("tenant", (F.col("o_custkey") % 8).cast("int"))
        .write.partitionBy("tenant")
        .parquet(path)
    )
    q = spark.read.parquet(path).filter(F.col("tenant").isin(1, 5))
    scan = _scan_node(q._jdf.queryExecution().executedPlan().toString())
    pf = scan.split("PartitionFilters")[1].split("]")[0]
    assert "tenant" in pf and ("IN" in pf.upper() or "in(" in pf)
