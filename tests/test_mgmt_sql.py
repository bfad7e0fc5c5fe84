"""The reference's literal SQL management-UDF syntax must work
through DistributedSession.sql — paste-compatible DDL."""

import pytest

from citus_spark.session import DistributedSession
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    s = DistributedSession(spark)
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").createOrReplaceTempView(
        "orders_m"
    )
    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").createOrReplaceTempView(
        "lineitem_m"
    )
    spark.read.parquet(f"{SF_SMALL}/nation.parquet").createOrReplaceTempView(
        "nation_m"
    )
    return s


def test_create_distributed_table_sql(sess):
    out = sess.sql("SELECT create_distributed_table('orders_m', 'o_orderkey')")
    assert out.columns == ["create_distributed_table"]
    e = sess.catalog.get("orders_m")
    assert e.is_hash_distributed and e.dist_col == "o_orderkey"

    sess.sql(
        "SELECT create_distributed_table('lineitem_m', 'l_orderkey', "
        "colocate_with => 'orders_m')"
    )
    assert sess.catalog.colocated("lineitem_m", "orders_m")


def test_reference_alter_undistribute_sql(sess):
    sess.sql("SELECT create_reference_table('nation_m')")
    assert sess.catalog.get("nation_m").is_reference

    sess.sql("SELECT create_distributed_table('orders_m', 'o_orderkey')")
    sess.sql(
        "SELECT alter_distributed_table('orders_m', "
        "distribution_column => 'o_custkey', shard_count => 16)"
    )
    e = sess.catalog.get("orders_m")
    assert e.dist_col == "o_custkey" and e.buckets == 16

    sess.sql("SELECT undistribute_table('orders_m')")
    assert not sess.catalog.get("orders_m").is_hash_distributed


def test_citus_tables_view_sql(sess):
    sess.sql("SELECT create_distributed_table('orders_m', 'o_orderkey')")
    sess.sql("SELECT create_reference_table('nation_m')")
    rows = {
        r.table_name: r.citus_table_type
        for r in sess.sql(
            "SELECT table_name, citus_table_type FROM citus_tables() "
            "ORDER BY table_name"
        ).collect()
    }
    assert rows["orders_m"] == "hash" and rows["nation_m"] == "reference"


def test_non_mgmt_sql_unaffected(sess):
    n = sess.sql("SELECT count(*) AS n FROM orders_m").collect()[0].n
    assert n > 0


def test_citus_shards_view_sql(sess, spark):
    """citus_shards: one row per hash bucket / reference replica,
    per-shard rows summing to the table count, shard ids allocated
    from 102008, sizes prorated from the parquet bytes."""
    sess.sql(
        "SELECT create_distributed_table('orders_m', 'o_orderkey', "
        "shard_count => 8)"
    )
    sess.sql("SELECT create_reference_table('nation_m')")
    rows = sess.sql(
        "SELECT * FROM citus_shards ORDER BY shardid"
    ).collect()
    orders = [r for r in rows if r.table_name == "orders_m"]
    nation = [r for r in rows if r.table_name == "nation_m"]
    assert len(orders) == 8 and len(nation) == 1
    assert orders[0].shardid == 102008
    assert orders[0].shard_name == "orders_m_102008"
    assert [r.shardid for r in orders] == list(range(102008, 102016))
    total = spark.table("orders_m").count()
    assert sum(r.shard_rows for r in orders) == total
    assert nation[0].citus_table_type == "reference"
    assert nation[0].shard_rows == spark.table("nation_m").count()
    # parquet-backed → prorated byte sizes present and plausible
    assert all(r.shard_size is not None and r.shard_size >= 0 for r in orders)
    # joinable with citus_tables in one statement (both rewrites fire)
    joined = sess.sql(
        "SELECT t.table_name, count(*) AS n FROM citus_tables t "
        "JOIN citus_shards s ON s.table_name = t.table_name "
        "GROUP BY t.table_name ORDER BY t.table_name"
    ).collect()
    assert {r.table_name: r.n for r in joined}["orders_m"] == 8


def test_citus_table_size_functions(spark, tmp_path):
    """↔ reference citus_table_size()/citus_total_relation_size():
    live storage bytes; all variants coincide on parquet (no separate
    forks), and a time-partitioned table reports its LIVE layout."""
    import os

    import pytest

    from citus_spark.session import DistributedSession
    from tests.conftest import SF_SMALL

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    fixture = os.path.getsize(f"{SF_SMALL}/orders.parquet")
    got = s.sql("SELECT citus_table_size('orders')").collect()[0][0]
    assert got == fixture
    assert (
        s.sql("SELECT citus_total_relation_size('orders')").collect()[0][0]
        == fixture
    )
    # time-partitioned: size follows the live layout, and shrinks
    # when partitions drop
    s.create_time_partitions(
        "events", ts_col="ts", granularity="day",
        path=str(tmp_path / "ev_tp"),
    )
    full = s.sql("SELECT citus_table_size('events')").collect()[0][0]
    periods = sorted(
        str(r._period)
        for r in spark.table("events").select("_period").distinct().collect()
    )
    s.drop_old_time_partitions("events", older_than=periods[1])
    after = s.sql("SELECT citus_table_size('events')").collect()[0][0]
    assert 0 < after < full
    with pytest.raises(Exception, match="not a Citus table"):
        s.sql("SELECT citus_table_size('no_such_table')")


def test_update_colocation_preserves_physical_metadata(spark):
    """Re-grouping must keep path/columnar/time-partitioning — losing
    the storage path would break every subsequent DML and size call."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("CREATE TABLE coloc_a (k bigint, v text)")
    s.sql("CREATE TABLE coloc_b (k bigint, w text)")
    s.sql("INSERT INTO coloc_a VALUES (1, 'x')")
    s.sql("SELECT create_distributed_table('coloc_a', 'k')")
    s.sql("SELECT create_distributed_table('coloc_b', 'k')")
    path_before = s.catalog.get("coloc_a").path
    assert path_before
    s.sql(
        "SELECT update_distributed_table_colocation('coloc_a', "
        "colocate_with => 'coloc_b')"
    )
    assert s.catalog.get("coloc_a").path == path_before
    assert s.catalog.colocated("coloc_a", "coloc_b")
    # storage still writable and sized after the re-grouping
    s.sql("INSERT INTO coloc_a VALUES (2, 'y')")
    assert s.sql("SELECT citus_table_size('coloc_a')").collect()[0][0] > 0
    s.sql("SELECT update_distributed_table_colocation('coloc_a', "
          "colocate_with => 'none')")
    assert s.catalog.get("coloc_a").path == path_before
    s.sql("DROP TABLE coloc_a")
    s.sql("DROP TABLE coloc_b")


# --- node management (↔ multi_cluster_management.sql) ----------------------

def test_node_management_script_runs_verbatim(sess):
    # the regress idiom: SELECT 1 FROM citus_add_node(...)
    r = sess.sql("SELECT citus_set_coordinator_host('localhost')")
    assert r is not None
    n1 = sess.sql("SELECT citus_add_node('localhost', 9701)").collect()
    n2 = sess.sql("SELECT master_add_node('localhost', 9702)").collect()
    assert n1[0][0] == 1 and n2[0][0] == 2
    # idempotent re-add returns the same id
    again = sess.sql("SELECT citus_add_node('localhost', 9701)").collect()
    assert again[0][0] == 1
    workers = sess.sql(
        "SELECT * FROM citus_get_active_worker_nodes() ORDER BY node_port"
    ).collect()
    assert [(w.node_name, w.node_port) for w in workers] == [
        ("localhost", 9701),
        ("localhost", 9702),
    ]
    assert (
        sess.sql("SELECT citus_activate_node('localhost', 9702)")
        .collect()[0][0]
        == 2
    )
    sess.sql("SELECT citus_remove_node('localhost', 9702)")
    left = sess.sql(
        "SELECT count(*) AS n FROM master_get_active_worker_nodes()"
    ).collect()[0].n
    assert left == 1
    import pytest as _pt

    with _pt.raises(Exception, match="does not exist"):
        sess.sql("SELECT citus_remove_node('localhost', 9999)")


def test_master_create_distributed_table_legacy_spelling(sess, spark):
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .createOrReplaceTempView("legacy_orders")
    sess.sql(
        "SELECT master_create_distributed_table("
        "'legacy_orders', 'o_custkey', 'hash')"
    )
    entry = sess.catalog.get("legacy_orders")
    assert entry is not None and entry.dist_col == "o_custkey"
    import pytest as _pt

    with _pt.raises(Exception, match="legacy append"):
        sess.sql(
            "SELECT master_create_distributed_table("
            "'legacy_orders', 'o_custkey', 'append')"
        )


# --- pg_dist_* catalog tables (↔ pg_dist_partition.h etc.) -----------------

def test_pg_dist_catalog_tables_queryable(sess, spark):
    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("pgd_orders")
    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet") \
        .createOrReplaceTempView("pgd_lineitem")
    spark.read.parquet(f"{SF_SMALL}/nation.parquet") \
        .createOrReplaceTempView("pgd_nation")
    sess.sql(
        "SELECT create_distributed_table('pgd_orders', 'o_custkey', "
        "shard_count => 4)"
    )
    sess.sql(
        "SELECT create_distributed_table('pgd_lineitem', 'l_orderkey', "
        "shard_count => 4, colocate_with => 'pgd_orders')"
    )
    sess.sql("SELECT create_reference_table('pgd_nation')")

    part = {
        r.logicalrelid: r
        for r in sess.sql(
            "SELECT * FROM pg_dist_partition"
        ).collect()
    }
    assert part["pgd_orders"].partmethod == "h"
    assert part["pgd_orders"].partkey == "o_custkey"
    assert part["pgd_nation"].partmethod == "n"
    assert part["pgd_nation"].repmodel == "t"
    assert (
        part["pgd_orders"].colocationid == part["pgd_lineitem"].colocationid
    )

    # the regress join idiom: shards per relation with hash ranges
    shards = sess.sql(
        "SELECT s.logicalrelid, count(*) AS n, "
        "min(CAST(shardminvalue AS BIGINT)) AS lo, "
        "max(CAST(shardmaxvalue AS BIGINT)) AS hi "
        "FROM pg_dist_shard s JOIN pg_dist_partition p "
        "ON s.logicalrelid = p.logicalrelid "
        "WHERE p.partmethod = 'h' GROUP BY s.logicalrelid"
    ).collect()
    assert {r.logicalrelid: r.n for r in shards} == {
        "pgd_orders": 4,
        "pgd_lineitem": 4,
    }
    for r in shards:
        assert r.lo == -(1 << 31) and r.hi == (1 << 31) - 1

    colo = sess.sql(
        "SELECT * FROM pg_dist_colocation ORDER BY colocationid"
    ).collect()
    assert any(c.shardcount == 4 for c in colo)

    sess.sql("SELECT citus_add_node('localhost', 9701)")
    nodes = sess.sql("SELECT * FROM pg_dist_node").collect()
    assert [(n.nodename, n.nodeport, n.isactive) for n in nodes] == [
        ("localhost", 9701, True)
    ]


# --- pg_size_pretty / pg_relation_size (↔ PG dbsize.c; used by
# reference regress as pg_size_pretty(pg_relation_size('t'))) ---------------

def _pg_size_pretty_ref(sz: int) -> str:
    # dbsize.c verbatim: shift 9 once, then 10 per unit; limit2=20479;
    # half-rounding away from zero
    def half(x):
        return (x + (1 if x >= 0 else -1)) // 2 if x >= 0 else -((-x + 1) // 2)

    if abs(sz) < 10 * 1024:
        return f"{sz} bytes"
    size = sz >> 9
    for unit in ("kB", "MB", "GB", "TB"):
        if abs(size) < 20479:
            return f"{half(size)} {unit}"
        size >>= 10
    return f"{half(size)} PB"


def test_pg_size_pretty_matches_postgres_algorithm(sess):
    vals = [0, 1, 10239, 10240, 10752, 1048576, 1536000, 10 ** 9,
            5 * 10 ** 12, 7 * 10 ** 15]
    got = sess.sql(
        "SELECT " + ", ".join(
            f"pg_size_pretty(CAST({v} AS BIGINT)) AS c{i}"
            for i, v in enumerate(vals)
        )
    ).collect()[0]
    for i, v in enumerate(vals):
        assert got[i] == _pg_size_pretty_ref(v), (v, got[i])


def test_pg_relation_size_folds_to_storage_bytes(sess, spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    p = str(tmp_path / "nat")
    df.write.parquet(p)
    sess.create_distributed_table(
        "szn", spark.read.parquet(p), "n_nationkey", buckets=2
    )
    sess.catalog.get("szn").path = p
    import os

    want = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p) for f in fs
    )
    row = sess.sql(
        "SELECT pg_relation_size('szn') AS b, "
        "pg_size_pretty(pg_total_relation_size('szn')) AS pretty"
    ).collect()[0]
    assert row.b == want
    assert row.pretty == _pg_size_pretty_ref(want)


def test_pg_size_pretty_negative_values(sess):
    # size deltas are routine: dbsize.c floors via arithmetic shift
    # and half-rounds away from zero — the Spark UDF must match
    vals = [-1, -10239, -10241, -1536000, -(10 ** 9), -(5 * 10 ** 12)]
    got = sess.sql(
        "SELECT " + ", ".join(
            f"pg_size_pretty(CAST({v} AS BIGINT)) AS c{i}"
            for i, v in enumerate(vals)
        )
    ).collect()[0]
    import ctypes

    def ref(sz):
        def half(x):
            return (x + (-1 if x < 0 else 1)) // 2 if x >= 0 or (x % 2 == 0) \
                else -((-x + 1) // 2)
        # exact C semantics: arithmetic shift + trunc-toward-zero div
        if abs(sz) < 10 * 1024:
            return f"{sz} bytes"
        size = sz >> 9
        for unit in ("kB", "MB", "GB", "TB"):
            if abs(size) < 20479:
                h = size + (-1 if size < 0 else 1)
                q = int(h / 2) if h >= 0 else -((-h) // 2)
                return f"{q} {unit}"
            size >>= 10
        h = size + (-1 if size < 0 else 1)
        q = int(h / 2) if h >= 0 else -((-h) // 2)
        return f"{q} PB"

    for i, v in enumerate(vals):
        assert got[i] == ref(v), (v, got[i])
    # the review's concrete repro: PostgreSQL returns '-11 kB'
    assert got[2] == "-11 kB"


def test_size_fns_case_insensitive_and_in_expressions(sess, spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    p = str(tmp_path / "reg")
    df.write.parquet(p)
    sess.create_distributed_table(
        "szr", spark.read.parquet(p), "r_regionkey", buckets=2
    )
    sess.catalog.get("szr").path = p
    import os

    want = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p) for f in fs
    )
    # upper-case spelling folds too (PG identifiers are case-insensitive)
    row = sess.sql("SELECT PG_RELATION_SIZE('szr') AS b").collect()[0]
    assert row.b == want
    # an EXPRESSION leading with the citus_* spelling must not be
    # hijacked by the mgmt dispatcher — it folds and evaluates
    row = sess.sql(
        "SELECT citus_table_size('szr') + citus_table_size('szr') AS b2"
    ).collect()[0]
    assert row.b2 == 2 * want
