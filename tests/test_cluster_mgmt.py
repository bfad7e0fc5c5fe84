"""Cluster-management surface (round 6, citus_spark/cluster.py):
shard-id computation, placement metadata + moves/drain, the
background-rebalance job registry, per-shard/per-node command
fan-out, introspection scalars, and DDL reconstruction — all through
the literal SQL spellings the reference regress scripts use."""

import re

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    s.sql("SELECT create_distributed_table('orders', 'o_custkey')")
    return s


@pytest.fixture()
def cluster_sess(sess):
    sess.sql("SELECT citus_set_coordinator_host('coord', 5432)")
    sess.sql("SELECT citus_add_node('w1', 5432)")
    sess.sql("SELECT citus_add_node('w2', 5432)")
    return sess


def test_get_shard_id_matches_placement_hash(sess):
    from citus_spark import cluster

    base = cluster.shard_base_ids(sess)["orders"]
    t = sess.catalog.get("orders")
    for v in (1, 7, 123, 999):
        sid = sess.sql(
            f"SELECT get_shard_id_for_distribution_column('orders', {v})"
        ).collect()[0][0]
        b = sess.spark.sql(
            f"SELECT pmod(hash(CAST({v} AS bigint)), {t.buckets}) AS b"
        ).collect()[0].b
        assert sid == base + b
        assert base <= sid < base + t.buckets


def test_get_shard_id_rejects_non_distributed(sess):
    with pytest.raises(ValueError, match="hash-distributed"):
        sess.sql(
            "SELECT get_shard_id_for_distribution_column('customer', 1)"
        )


def test_run_command_on_shards_counts_sum(sess):
    rows = sess.sql(
        "SELECT run_command_on_shards('orders', 'SELECT count(*) FROM %s')"
    ).collect()
    t = sess.catalog.get("orders")
    assert len(rows) == t.buckets
    assert all(r.success for r in rows)
    total = sum(int(r.result) for r in rows)
    assert total == sess.spark.table("orders").count()


def test_run_command_on_shards_requires_placeholder(sess):
    with pytest.raises(ValueError, match="%s"):
        sess.sql("SELECT run_command_on_shards('orders', 'SELECT 1')")


def test_placements_round_robin_and_move(cluster_sess):
    s = cluster_sess
    rows = s.sql(
        "SELECT groupid, count(*) AS n FROM pg_dist_placement "
        "WHERE shardid >= 102008 GROUP BY groupid ORDER BY groupid"
    ).collect()
    groups = {r.groupid: r.n for r in rows}
    assert len(groups) == 2  # two workers share the shards
    assert max(groups.values()) - min(groups.values()) <= 1  # balanced

    sid = s.sql(
        "SELECT get_shard_id_for_distribution_column('orders', 1)"
    ).collect()[0][0]
    before = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].groupid
    src = "w1" if before == 1 else "w2"
    dst = "w2" if src == "w1" else "w1"
    s.sql(
        f"SELECT citus_move_shard_placement({sid}, '{src}', 5432, "
        f"'{dst}', 5432)"
    )
    after = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].groupid
    assert after != before

    # moving from a node that does not hold the shard rejects
    with pytest.raises(ValueError, match="no placement"):
        s.sql(
            f"SELECT citus_move_shard_placement({sid}, '{src}', 5432, "
            f"'{dst}', 5432)"
        )


def test_copy_shard_placement_adds_replica(cluster_sess):
    s = cluster_sess
    sid = 102008
    holder = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].groupid
    src = "w1" if holder == 1 else "w2"
    dst = "w2" if src == "w1" else "w1"
    s.sql(
        f"SELECT citus_copy_shard_placement({sid}, '{src}', 5432, "
        f"'{dst}', 5432)"
    )
    n = s.sql(
        f"SELECT count(*) AS n FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].n
    assert n == 2
    with pytest.raises(ValueError, match="already has a placement"):
        s.sql(
            f"SELECT citus_copy_shard_placement({sid}, '{src}', 5432, "
            f"'{dst}', 5432)"
        )


def test_drain_node_empties_it(cluster_sess):
    s = cluster_sess
    s.sql("SELECT citus_drain_node('w1', 5432)")
    left = s.sql(
        "SELECT count(*) AS n FROM pg_dist_placement WHERE groupid = 1"
    ).collect()[0].n
    assert left == 0
    # drained node refuses new shards: a rebalance keeps it empty
    s.sql("SELECT citus_rebalance_start()")
    left2 = s.sql(
        "SELECT count(*) AS n FROM pg_dist_placement WHERE groupid = 1"
    ).collect()[0].n
    assert left2 == 0
    # until shouldhaveshards is flipped back
    s.sql("SELECT citus_set_node_property('w1', 5432, "
          "'shouldhaveshards', true)")
    s.sql("SELECT citus_rebalance_start()")
    back = s.sql(
        "SELECT count(*) AS n FROM pg_dist_placement WHERE groupid = 1"
    ).collect()[0].n
    assert back > 0


def test_rebalance_job_registry(cluster_sess):
    s = cluster_sess
    jid = s.sql("SELECT citus_rebalance_start()").collect()[0][0]
    st = s.sql("SELECT citus_rebalance_status()").collect()
    assert any(r.job_id == jid and r.state == "finished" for r in st)
    s.sql(f"SELECT citus_job_wait({jid})")  # finished -> returns
    with pytest.raises(ValueError, match="terminal state"):
        s.sql(f"SELECT citus_job_wait({jid}, desired_status => 'running')")
    with pytest.raises(ValueError, match="already finished"):
        s.sql(f"SELECT citus_job_cancel({jid})")
    with pytest.raises(ValueError, match="no ongoing rebalance"):
        s.sql("SELECT citus_rebalance_stop()")


def test_run_command_on_workers_and_nodes(cluster_sess):
    s = cluster_sess
    rows = s.sql(
        "SELECT run_command_on_workers('SELECT count(*) FROM orders')"
    ).collect()
    assert {r.nodename for r in rows} == {"w1", "w2"}
    n = s.spark.table("orders").count()
    assert all(r.success and int(r.result) == n for r in rows)
    allrows = s.sql(
        "SELECT run_command_on_all_nodes('SELECT 1')"
    ).collect()
    assert {r.nodename for r in allrows} == {"coord", "w1", "w2"}
    bad = s.sql(
        "SELECT run_command_on_coordinator('SELECT no_such_col FROM "
        "orders')"
    ).collect()
    assert len(bad) == 1 and not bad[0].success


def test_introspection_scalars(cluster_sess):
    import os

    s = cluster_sess
    assert s.sql("SELECT citus_is_coordinator()").collect()[0][0] is True
    gpid = s.sql("SELECT citus_backend_gpid()").collect()[0][0]
    assert gpid == os.getpid()  # coordinator group 0
    nid = s.sql(
        "SELECT nodeid FROM pg_dist_node WHERE nodename = 'w1'"
    ).collect()[0].nodeid
    name = s.sql(
        f"SELECT citus_nodename_for_nodeid({nid})"
    ).collect()[0][0]
    assert name == "w1"
    g = s.sql(
        f"SELECT citus_calculate_gpid({nid}, 7)"
    ).collect()[0][0]
    assert g % 10_000_000_000 == 7
    sid1 = s.sql("SELECT citus_server_id()").collect()[0][0]
    sid2 = s.sql("SELECT citus_server_id()").collect()[0][0]
    assert sid1 == sid2 and len(sid1) == 36
    health = s.sql("SELECT citus_check_cluster_node_health()").collect()
    assert len(health) == 9 and all(r.result for r in health)


def test_ddl_events_and_local_table(sess):
    rows = sess.sql(
        "SELECT master_get_table_ddl_events('orders')"
    ).collect()
    ddl = [r[0] for r in rows]
    assert ddl[0].startswith("CREATE TABLE orders (")
    assert "o_orderkey bigint" in ddl[0]
    assert "create_distributed_table('orders', 'o_custkey'" in ddl[1]

    sess.spark.sql(
        "SELECT 1 AS id, 'x' AS v"
    ).createOrReplaceTempView("localtab")
    sess.sql("SELECT citus_add_local_table_to_metadata('localtab')")
    tabs = sess.sql(
        "SELECT * FROM citus_tables WHERE table_name = 'localtab'"
    ).collect()
    assert len(tabs) == 1 and tabs[0].citus_table_type == "none"

    sess.sql("SELECT truncate_local_data_after_distributing_table"
             "('orders')")
    with pytest.raises(ValueError, match="not a distributed table"):
        sess.sql("SELECT truncate_local_data_after_distributing_table"
                 "('no_such_table')")


def test_shard_sizes_and_update_statistics(sess):
    sizes = sess.sql("SELECT citus_shard_sizes()").collect()
    t = sess.catalog.get("orders")
    assert len(sizes) >= t.buckets
    sid = sizes[0].shard_id
    v = sess.sql(
        f"SELECT citus_update_shard_statistics({sid})"
    ).collect()[0][0]
    assert v == sizes[0].size
    sess.sql("SELECT citus_update_table_statistics('orders')")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("SELECT citus_update_shard_statistics(999999)")


def test_create_distributed_table_concurrently(sess):
    sess.sql(
        "SELECT create_distributed_table_concurrently('customer', "
        "'c_custkey')"
    )
    t = sess.catalog.get("customer")
    assert t is not None and t.is_hash_distributed
    assert t.dist_col == "c_custkey"


# ------------------------------------------------ review-pass regressions
def test_move_to_holder_rejected_and_no_silent_dedup(cluster_sess):
    s = cluster_sess
    sid = 102008
    holder = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].groupid
    src = "w1" if holder == 1 else "w2"
    # moving onto the node that already holds it errors (reference
    # semantics) — it must NOT silently drop a replica or no-op
    with pytest.raises(ValueError, match="already exists"):
        s.sql(
            f"SELECT citus_move_shard_placement({sid}, '{src}', 5432, "
            f"'{src}', 5432)"
        )


def test_run_command_on_shards_literal_percent(sess):
    rows = sess.sql(
        "SELECT run_command_on_shards('orders', "
        "'SELECT count(*) FROM %s WHERE o_orderpriority LIKE ''1%''')"
    ).collect()
    assert all(r.success for r in rows)
    total = sum(int(r.result) for r in rows)
    expect = sess.spark.sql(
        "SELECT count(*) AS c FROM orders WHERE o_orderpriority LIKE '1%'"
    ).collect()[0].c
    assert total == expect


def test_run_command_quoted_literal_argument(cluster_sess):
    rows = cluster_sess.sql(
        "SELECT run_command_on_workers('SELECT ''x''')"
    ).collect()
    assert all(r.success and r.result == "x" for r in rows)


def test_select_one_from_set_returning_fn(cluster_sess):
    rows = cluster_sess.sql(
        "SELECT 1 FROM run_command_on_workers('SELECT 1')"
    ).collect()
    assert len(rows) == 2  # one literal row PER worker, like PG


def test_drain_moves_only_drained_shards(cluster_sess):
    s = cluster_sess
    before = {
        r.shardid: r.groupid
        for r in s.sql("SELECT * FROM pg_dist_placement").collect()
    }
    drained_group = 1
    s.sql("SELECT citus_drain_node('w1', 5432)")
    after = {
        r.shardid: r.groupid
        for r in s.sql("SELECT * FROM pg_dist_placement").collect()
    }
    for sid, g in before.items():
        if g != drained_group:
            assert after[sid] == g  # untouched
        else:
            assert after[sid] != drained_group
    # re-enabling the property ALONE must not bring shards back —
    # only a rebalance does (reference semantics)
    s.sql("SELECT citus_set_node_property('w1', 5432, "
          "'shouldhaveshards', true)")
    still = s.sql(
        "SELECT count(*) AS n FROM pg_dist_placement WHERE groupid = 1"
    ).collect()[0].n
    assert still == 0


def test_placements_survive_catalog_mutation(cluster_sess):
    s = cluster_sess
    # distribute a second table AFTER orders so its ids come later
    s.sql("SELECT create_distributed_table('customer', 'c_custkey')")
    sid = s.sql(
        "SELECT get_shard_id_for_distribution_column('customer', 1)"
    ).collect()[0][0]
    holder = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid}"
    ).collect()[0].groupid
    src = "w1" if holder == 1 else "w2"
    dst = "w2" if src == "w1" else "w1"
    s.sql(
        f"SELECT citus_move_shard_placement({sid}, '{src}', 5432, "
        f"'{dst}', 5432)"
    )
    want = 2 if dst == "w2" else 1
    # undistributing an EARLIER catalog entry re-keys the derived
    # shard ids; the explicit placement must follow its table
    s.sql("SELECT undistribute_table('orders')")
    sid2 = s.sql(
        "SELECT get_shard_id_for_distribution_column('customer', 1)"
    ).collect()[0][0]
    assert sid2 != sid  # ids DID shift
    g = s.sql(
        f"SELECT groupid FROM pg_dist_placement WHERE shardid = {sid2}"
    ).collect()[0].groupid
    assert g == want  # the move followed the shard, not the stale id


# -- round-7: citus_split_shard_by_split_points


def test_split_shard_by_split_points(spark):
    from citus_spark import cluster
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("CREATE TABLE spl_t (k int, v int)")
    s.sql("CREATE TABLE spl_u (k int, w int)")
    s.sql("SELECT create_distributed_table('spl_t', 'k')")
    s.sql(
        "SELECT create_distributed_table('spl_u', 'k', "
        "colocate_with => 'spl_t')"
    )
    s.sql("INSERT INTO spl_t SELECT id, id*10 FROM range(0, 500)")
    s.sql("INSERT INTO spl_u SELECT id, id*7 FROM range(0, 500)")
    sid = cluster.get_shard_id_for_distribution_column(s, "spl_t", 42)
    new_ids = [
        r[0]
        for r in s.sql(
            f"SELECT citus_split_shard_by_split_points({sid}, ARRAY['0'])"
        ).collect()
    ]
    assert len(new_ids) == 2
    # routing resolves to a child; the parent id stops existing
    sid2 = cluster.get_shard_id_for_distribution_column(s, "spl_t", 42)
    assert sid2 in new_ids
    with pytest.raises(ValueError, match="does not exist"):
        cluster._shard_key(s, sid)
    # colocation-group cascade: the colocated member split too
    assert s.catalog.get("spl_u").splits is not None
    # citus_shards accounts every row exactly once (children included)
    sh = s.citus_shards(only_table="spl_t").collect()
    assert sum(r[5] for r in sh if r[5] is not None) == 500
    child_counts = {r[1]: r[5] for r in sh if r[1] in new_ids}
    assert set(child_counts) == set(new_ids)
    assert sum(child_counts.values()) > 0
    # values unchanged by the physical rewrite
    assert (
        s.spark.table("spl_t").groupBy().sum("v").collect()[0][0]
        == sum(i * 10 for i in range(500))
    )
    # pg_dist_shard publishes the children with their REAL bounds
    pd = s.sql(
        "SELECT shardid FROM pg_dist_shard WHERE logicalrelid = 'spl_t'"
    ).collect()
    ids = {r.shardid for r in pd}
    assert set(new_ids) <= ids and sid not in ids
    # an already-split child cannot be split again (honest rejection)
    with pytest.raises(ValueError, match="splittable"):
        s.sql(
            f"SELECT citus_split_shard_by_split_points({new_ids[0]}, "
            "ARRAY['100'])"
        )
    for t in ("spl_u", "spl_t"):
        s.sql(f"DROP TABLE {t}")


def test_split_shard_validation(spark):
    from citus_spark import cluster
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("CREATE TABLE spl_v (k int)")
    s.sql("SELECT create_distributed_table('spl_v', 'k')")
    s.sql("INSERT INTO spl_v SELECT id FROM range(0, 50)")
    sid = cluster.get_shard_id_for_distribution_column(s, "spl_v", 1)
    with pytest.raises(ValueError, match="no split points"):
        cluster.citus_split_shard_by_split_points(s, sid, [])
    with pytest.raises(ValueError, match="duplicate"):
        cluster.citus_split_shard_by_split_points(s, sid, [5, 5])
    with pytest.raises(ValueError, match="node ids"):
        cluster.citus_split_shard_by_split_points(s, sid, [5], node_ids=[1])
    with pytest.raises(ValueError, match="must be integers"):
        cluster.citus_split_shard_by_split_points(s, sid, ["x"])
    s.sql("DROP TABLE spl_v")


def test_run_command_on_shards_agg_fast_path(spark):
    """The grouped fast path must be cell-identical to the faithful
    per-shard loop, empty shards included."""
    from citus_spark import cluster
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("CREATE TABLE rcs_t (k int, v int)")
    s.sql("SELECT create_distributed_table('rcs_t', 'k')")
    s.sql("INSERT INTO rcs_t SELECT id, id * 3 FROM range(0, 200)")

    def rows(cmd):
        return sorted(
            tuple(r)
            for r in cluster.run_command_on_shards(s, "rcs_t", cmd).collect()
        )

    for cmd in (
        "SELECT count(*) FROM %s",
        "SELECT sum(v) FROM %s",
        "SELECT max(v) FROM %s WHERE k % 2 = 0",
    ):
        fast = rows(cmd)
        # defeat the shape regex (extra column) → the serial loop...
        # no: force the loop by monkeypatching the matcher off
        orig = cluster._SHARD_AGG
        cluster._SHARD_AGG = re.compile(r"(?!x)x")
        try:
            slow = rows(cmd)
        finally:
            cluster._SHARD_AGG = orig
        assert fast == slow, cmd
    # a non-aggregate command still takes the faithful loop
    out = cluster.run_command_on_shards(
        s, "rcs_t", "SELECT count(*) + 1 FROM %s"
    ).collect()
    assert len(out) == 32 and all(r.success for r in out)
    s.sql("DROP TABLE rcs_t")


# -- round-7: rebalance strategies (pg_dist_rebalance_strategy)


def test_rebalance_strategies(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    rows = {
        r["name"]: r
        for r in s.sql("SELECT * FROM pg_dist_rebalance_strategy").collect()
    }
    assert rows["by_shard_count"]["default_strategy"] is True
    assert rows["by_disk_size"]["default_strategy"] is False
    # add a custom strategy, flip the default, view reflects it
    s.sql(
        "SELECT citus_add_rebalance_strategy('my_cost', 'cost_fn', "
        "'cap_fn', 'allowed_fn', 0.2, 0.1)"
    )
    s.sql("SELECT citus_set_default_rebalance_strategy('by_disk_size')")
    rows = {
        r["name"]: r
        for r in s.sql("SELECT * FROM pg_dist_rebalance_strategy").collect()
    }
    assert set(rows) == {"by_shard_count", "by_disk_size", "my_cost"}
    assert rows["by_disk_size"]["default_strategy"] is True
    assert rows["by_shard_count"]["default_strategy"] is False
    # invariants and loud rejections
    with pytest.raises(ValueError, match="already exists"):
        s.sql(
            "SELECT citus_add_rebalance_strategy('my_cost', 'x', 'y', "
            "'z', 0.2, 0.1)"
        )
    with pytest.raises(ValueError, match="minimum_threshold"):
        s.sql(
            "SELECT citus_add_rebalance_strategy('bad', 'x', 'y', 'z', "
            "0.1, 0.5)"
        )
    s.sql("CREATE TABLE rbs_t (k bigint)")
    s.sql("SELECT create_distributed_table('rbs_t', 'k')")
    s.sql("INSERT INTO rbs_t SELECT id FROM range(0, 1000)")
    # custom strategy is registered metadata but not executable
    with pytest.raises(NotImplementedError, match="my_cost"):
        s.sql(
            "SELECT rebalance_table_shards('rbs_t', "
            "rebalance_strategy => 'my_cost')"
        )
    # by_disk_size runs (bytes-based proposal) — small table → 1 bucket
    plan = s.get_rebalance_table_shards_plan(
        "rbs_t", rebalance_strategy="by_disk_size"
    ).collect()
    assert plan[0]["proposed_shard_count"] == 1
    out = s.sql(
        "SELECT rebalance_table_shards('rbs_t', "
        "rebalance_strategy => 'by_disk_size')"
    ).collect()
    assert out[0]["new_shard_count"] == 1
    assert s.spark.table("rbs_t").count() == 1000
    s.sql("DROP TABLE rbs_t")


def test_disable_and_update_node(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    nid = s.sql("SELECT citus_add_node('w1', 7001)").collect()[0][0]
    s.sql("SELECT citus_add_node('w2', 7002)")
    # disable: node stays registered, stops being an active worker
    s.sql("SELECT citus_disable_node('w1', 7001)")
    active = {
        r.node_name for r in s.citus_get_active_worker_nodes().collect()
    }
    assert active == {"w2"}
    nodes = {r.nodename: r for r in s.sql(
        "SELECT nodename, isactive FROM pg_dist_node").collect()}
    assert nodes["w1"]["isactive"] is False
    s.sql("SELECT citus_activate_node('w1', 7001)")
    # update: re-address in place, same node id
    s.sql(f"SELECT citus_update_node({nid}, 'w1b', 7009)")
    names = {r.nodename for r in s.sql(
        "SELECT nodename FROM pg_dist_node").collect()}
    assert "w1b" in names and "w1" not in names
    import pytest as _p

    with _p.raises(ValueError, match="does not exist"):
        s.sql("SELECT citus_disable_node('ghost', 1)")
    with _p.raises(ValueError, match="does not exist"):
        s.sql("SELECT citus_update_node(999, 'x', 1)")


def test_split_table_single_shard_routing(spark):
    """After a split, a dist-col equality routes to ONE shard
    directory (plan-gated PartitionFilters) — any bucket, not just
    the split one — with values identical to the full scan."""
    from citus_spark import cluster
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS rt_route")
    s.sql("CREATE TABLE rt_route (k int, v int)")
    s.sql("SELECT create_distributed_table('rt_route', 'k')")
    s.sql("INSERT INTO rt_route SELECT id, id * 10 FROM range(0, 400)")
    sid = cluster.get_shard_id_for_distribution_column(s, "rt_route", 42)
    s.sql(f"SELECT citus_split_shard_by_split_points({sid}, ARRAY['0'])")
    for key in (42, 7):  # a split-bucket key and an untouched-bucket key
        df = s.sql(f"SELECT v FROM rt_route WHERE k = {key}")
        assert [r.v for r in df.collect()] == [key * 10]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "__citus_shard" in plan.split("PartitionFilters", 1)[1][:200]
    # joins / inequalities / OR never route (full plan, correct values)
    assert s.sql(
        "SELECT count(*) AS n FROM rt_route WHERE k < 50"
    ).collect()[0].n == 50
    assert s.sql(
        "SELECT count(*) AS n FROM rt_route WHERE k = 1 OR k = 2"
    ).collect()[0].n == 2
    s.sql("DROP TABLE rt_route")


def test_split_routing_soundness_guards(spark):
    """The r7 review's routing repros: arithmetic tails, cross-type
    coercion, and overflow literals must all run the FULL plan (or a
    correctly-empty one), never a mis-routed scan."""
    from citus_spark import cluster
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS rg_t")
    s.sql("CREATE TABLE rg_t (k int, v int)")
    s.sql("SELECT create_distributed_table('rg_t', 'k')")
    s.sql("INSERT INTO rg_t SELECT id, id * 10 FROM range(0, 300)")
    sid = cluster.get_shard_id_for_distribution_column(s, "rg_t", 7)
    s.sql(f"SELECT citus_split_shard_by_split_points({sid}, ARRAY['0'])")
    # arithmetic after the literal: Spark compares k = 8 — routing on
    # 7 would silently return empty
    assert [
        r.v for r in s.sql("SELECT v FROM rg_t WHERE k = 7 + 1").collect()
    ] == [80]
    # overflowing literal: valid always-false comparison, never an error
    assert s.sql(
        "SELECT count(*) AS n FROM rg_t WHERE k = 99999999999"
    ).collect()[0].n == 0
    # string dist col: unquoted numeral COERCES in Spark ('07' = 7 is
    # true) — the router must leave it to the full plan
    s.sql("DROP TABLE IF EXISTS rg_s")
    s.sql("CREATE TABLE rg_s (k string, v int)")
    s.sql("SELECT create_distributed_table('rg_s', 'k')")
    s.sql("INSERT INTO rg_s VALUES ('7', 1), ('07', 2)")
    sid2 = cluster.get_shard_id_for_distribution_column(s, "rg_s", "7")
    s.sql(f"SELECT citus_split_shard_by_split_points({sid2}, ARRAY['0'])")
    assert sorted(
        r.v for r in s.sql("SELECT v FROM rg_s WHERE k = 7").collect()
    ) == [1, 2]
    assert sorted(
        r.v for r in s.sql("SELECT v FROM rg_s WHERE k = '7'").collect()
    ) == [1]
    for t in ("rg_s", "rg_t"):
        s.sql(f"DROP TABLE {t}")
