"""citus_stat_statements analog (stats.py): statement fingerprinting,
router partition-key extraction from the optimized plan, call
accumulation, and the SQL-surface spellings."""

from tests.conftest import SF_SMALL


def test_normalize_and_queryid_stability():
    from citus_spark.stats import normalize_query, query_id

    a = normalize_query("SELECT * FROM orders WHERE o_orderkey = 42")
    b = normalize_query("SELECT  * FROM orders\nWHERE o_orderkey =  99")
    assert a == b == "SELECT * FROM orders WHERE o_orderkey = ?"
    assert query_id(a) == query_id(b)
    c = normalize_query("SELECT * FROM orders WHERE o_custkey = 'x y'")
    assert "'" not in c and "x y" not in c
    assert query_id(c) != query_id(a)


def test_router_vs_adaptive_and_call_accumulation(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    sess.stat_statements.reset()

    sess.sql("SELECT * FROM orders WHERE o_orderkey = 42")
    sess.sql("SELECT * FROM orders WHERE o_orderkey = 99")  # same shape
    sess.sql("SELECT count(*) AS n FROM orders")
    # dist-col equality against another ATTRIBUTE is a join, not a
    # router key
    sess.sql(
        "SELECT count(*) AS n FROM orders JOIN lineitem "
        "ON o_orderkey = l_orderkey"
    )

    rows = {r.query: r for r in sess.citus_stat_statements().collect()}
    router = rows["SELECT * FROM orders WHERE o_orderkey = ?"]
    assert router.executor == "router"
    assert router.partition_key == "42"  # first call's key, like the reference
    assert router.calls == 2
    agg = rows["SELECT count(*) AS n FROM orders"]
    assert agg.executor == "adaptive" and agg.partition_key is None
    join = rows[
        "SELECT count(*) AS n FROM orders JOIN lineitem "
        "ON o_orderkey = l_orderkey"
    ]
    assert join.executor == "adaptive" and join.partition_key is None


def test_sql_surface_view_and_reset(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    sess.stat_statements.reset()
    sess.sql("SELECT * FROM orders WHERE o_orderkey = 7")

    via_sql = sess.sql(
        "SELECT queryid, calls FROM citus_stat_statements "
        "WHERE executor = 'router'"
    ).collect()
    assert len(via_sql) == 1 and via_sql[0].calls == 1

    sess.sql("SELECT citus_stat_statements_reset()")
    assert sess.citus_stat_statements().count() == 0


def test_stat_activity_idle_and_during_job(spark):
    """citus_stat_activity: empty at idle; while a deliberately slow
    job runs in another thread it must report an active stage with a
    real task count."""
    import threading
    import time

    from pyspark.sql import functions as F

    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    assert sess.citus_stat_activity().count() == 0  # idle

    @F.udf("long")
    def slow(x):
        time.sleep(0.15)
        return x

    done = threading.Event()

    def run_job():
        spark.table("orders").limit(256).repartition(16).select(
            slow(F.col("o_orderkey"))
        ).write.format("noop").mode("overwrite").save()
        done.set()

    t = threading.Thread(target=run_job)
    t.start()
    seen = None
    deadline = time.time() + 20
    while time.time() < deadline and not done.is_set():
        rows = sess.citus_stat_activity().collect()
        active = [r for r in rows if r.num_tasks > 0]
        if active:
            seen = active
            break
        time.sleep(0.05)
    t.join()
    assert seen, "no active stage observed while the slow job ran"
    assert seen[0].status == "RUNNING"
    # the SQL spelling resolves the same view (idle again by now)
    via_sql = sess.sql("SELECT count(*) AS n FROM citus_stat_activity")
    assert via_sql.collect()[0].n >= 0


def test_stat_tenants_counts_per_key_not_per_shape(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    sess.stat_statements.reset()

    # one statement SHAPE, three tenants; tenant 42 hit twice via two
    # different shapes
    sess.sql("SELECT * FROM orders WHERE o_orderkey = 42")
    sess.sql("SELECT * FROM orders WHERE o_orderkey = 99")
    sess.sql("SELECT * FROM orders WHERE o_orderkey = 7")
    sess.sql("SELECT count(*) AS n FROM orders WHERE o_orderkey = 42")

    tenants = {r.tenant_attribute: r for r in sess.citus_stat_tenants().collect()}
    assert set(tenants) == {"42", "99", "7"}
    assert tenants["42"].query_count == 2
    assert tenants["42"].distinct_query_shapes == 2
    assert tenants["99"].query_count == 1
    assert tenants["99"].distinct_query_shapes == 1

    # SQL spelling
    top = sess.sql(
        "SELECT tenant_attribute FROM citus_stat_tenants "
        "ORDER BY query_count DESC LIMIT 1"
    ).collect()
    assert top[0].tenant_attribute == "42"

    sess.sql("SELECT citus_stat_statements_reset()")
    assert sess.citus_stat_tenants().count() == 0
