"""rebalance_table_shards analog: bucket-count right-sizing applied to
a whole colocation group (↔ reference operations/shard_rebalancer.c —
which moves placements; on Spark the scheduler owns placement, so the
rebalance lever is the bucket count, and the invariant worth testing
is the same one the reference's rebalancer preserves: colocation
survives the rewrite)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    s.create_distributed_table("orders_rb", orders, "o_orderkey", buckets=8)
    s.create_distributed_table(
        "lineitem_rb",
        lineitem,
        "l_orderkey",
        buckets=8,
        colocate_with="orders_rb",
    )
    return s


def test_plan_reports_group_and_proposal(sess):
    plan = sess.get_rebalance_table_shards_plan(
        "orders_rb", target_shard_rows=100
    ).collect()
    by_name = {r.table_name: r for r in plan}
    # the whole colocation group is planned, not just the named table
    assert set(by_name) == {"orders_rb", "lineitem_rb"}
    n_li = sess.spark.table("lineitem_rb").count()
    n_ord = sess.spark.table("orders_rb").count()
    assert by_name["lineitem_rb"].total_rows == n_li
    assert by_name["orders_rb"].total_rows == n_ord
    # proposal sized off the LARGEST member: ceil(rows / target)
    want = -(-max(n_li, n_ord) // 100)
    assert all(r.proposed_shard_count == want for r in plan)
    assert all(r.shard_count == 8 for r in plan)
    # dry run: nothing changed
    assert sess.catalog.get("orders_rb").buckets == 8


def test_rebalance_rewrites_group_preserving_rows_and_colocation(sess):
    before_ids = {
        t: sess.catalog.get(t).colocation_id
        for t in ("orders_rb", "lineitem_rb")
    }
    n_before = {
        t: sess.spark.table(t).count() for t in ("orders_rb", "lineitem_rb")
    }

    report = sess.rebalance_table_shards("orders_rb", shard_count=16).collect()
    assert {r.table_name for r in report} == {"orders_rb", "lineitem_rb"}
    assert all(r.old_shard_count == 8 and r.new_shard_count == 16 for r in report)

    for t in ("orders_rb", "lineitem_rb"):
        entry = sess.catalog.get(t)
        assert entry.buckets == 16
        assert entry.colocation_id == before_ids[t]  # group id preserved
        assert sess.spark.table(t).count() == n_before[t]
        assert sess.spark.table(t).rdd.getNumPartitions() == 16

    # colocation survives: the dist-col join of the rewritten views
    # needs no exchange beyond each side's own repartition (both sides
    # already satisfy hashpartitioning(key, 16))
    conf = sess.spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = sess.spark.table("lineitem_rb").join(
            sess.spark.table("orders_rb"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2  # the two repartitions; none added for the join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_rebalance_sql_front_door(sess):
    plan = sess.sql(
        "SELECT get_rebalance_table_shards_plan('orders_rb', "
        "target_shard_rows => 100)"
    )
    assert "proposed_shard_count" in plan.columns
    report = sess.sql(
        "SELECT rebalance_table_shards('orders_rb', shard_count => 4)"
    ).collect()
    assert all(r.new_shard_count == 4 for r in report)
    assert sess.catalog.get("lineitem_rb").buckets == 4
