"""Textual CREATE [MATERIALIZED] VIEW / REFRESH / DROP
(session._execute_view_ddl ↔ reference multi_view.sql /
materialized_view.sql). Plain views are LATE-BOUND: DML through the
session is visible on the next read. Materialized views snapshot at
CREATE/REFRESH time only."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_create_view_and_select(sess):
    sess.sql(
        "CREATE VIEW pri_counts AS SELECT o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY o_orderpriority"
    )
    rows = sess.sql(
        "SELECT * FROM pri_counts ORDER BY o_orderpriority"
    ).collect()
    assert len(rows) == 5 and all(r.n > 0 for r in rows)
    # duplicate without OR REPLACE errors; with it, succeeds
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("CREATE VIEW pri_counts AS SELECT 1 AS x")
    sess.sql("CREATE OR REPLACE VIEW pri_counts AS SELECT 1 AS x")
    assert sess.sql("SELECT * FROM pri_counts").collect()[0].x == 1
    sess.sql("DROP VIEW pri_counts")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("DROP VIEW pri_counts")


def test_view_is_late_bound_over_dml(sess):
    sess.sql("CREATE TABLE vt (k int, v text)")
    sess.sql("INSERT INTO vt VALUES (1, 'a'), (2, 'b')")
    sess.sql("CREATE VIEW vt_big AS SELECT k, v FROM vt WHERE k >= 2")
    assert sess.sql("SELECT count(*) AS n FROM vt_big").collect()[0].n == 1
    # a write AFTER view creation must be visible through the view
    sess.sql("INSERT INTO vt VALUES (3, 'c')")
    assert sess.sql("SELECT count(*) AS n FROM vt_big").collect()[0].n == 2
    sess.sql("UPDATE vt SET k = 9 WHERE v = 'a'")
    assert sess.sql("SELECT count(*) AS n FROM vt_big").collect()[0].n == 3


def test_view_on_view(sess):
    sess.sql("CREATE VIEW v1 AS SELECT o_custkey FROM orders WHERE o_custkey < 100")
    sess.sql("CREATE VIEW v2 AS SELECT count(*) AS n FROM v1")
    assert sess.sql("SELECT n FROM v2").collect()[0].n > 0


def test_matview_snapshots_until_refresh(sess):
    sess.sql("CREATE TABLE mt (k int)")
    sess.sql("INSERT INTO mt VALUES (1), (2)")
    sess.sql("CREATE MATERIALIZED VIEW mt_sum AS SELECT sum(k) AS s FROM mt")
    assert sess.sql("SELECT s FROM mt_sum").collect()[0].s == 3
    sess.sql("INSERT INTO mt VALUES (10)")
    # matview does NOT see the new row until refresh
    assert sess.sql("SELECT s FROM mt_sum").collect()[0].s == 3
    sess.sql("REFRESH MATERIALIZED VIEW mt_sum")
    assert sess.sql("SELECT s FROM mt_sum").collect()[0].s == 13
    sess.sql("DROP MATERIALIZED VIEW mt_sum")
    with pytest.raises(ValueError, match="not a materialized view"):
        sess.sql("REFRESH MATERIALIZED VIEW mt_sum")


def test_matview_with_no_data_needs_refresh(sess):
    sess.sql(
        "CREATE MATERIALIZED VIEW empty_mv AS "
        "SELECT count(*) AS n FROM orders WITH NO DATA"
    )
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM empty_mv").collect()
    sess.sql("REFRESH MATERIALIZED VIEW empty_mv")
    assert sess.sql("SELECT n FROM empty_mv").collect()[0].n > 0


def test_view_with_pg_spellings_in_body(sess):
    # the defining query itself goes through the PG rewrite chain
    sess.sql(
        "CREATE VIEW latest_per_cust AS "
        "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderdate "
        "FROM orders ORDER BY o_custkey, o_orderdate DESC"
    )
    rows = sess.sql(
        "SELECT count(*) AS n, count(DISTINCT o_custkey) AS d "
        "FROM latest_per_cust"
    ).collect()[0]
    assert rows.n == rows.d > 0


def test_dropped_base_table_does_not_brick_session(sess):
    sess.sql("CREATE TABLE vb (k int)")
    sess.sql("INSERT INTO vb VALUES (1)")
    sess.sql("CREATE VIEW vb_view AS SELECT k FROM vb")
    sess.sql("DROP TABLE vb")
    # session stays usable; the view itself reads fail loudly
    assert sess.sql("SELECT 1 AS x").collect()[0].x == 1
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM vb_view").collect()
    sess.sql("DROP VIEW vb_view")


def test_pg_catalog_views(sess):
    sess.sql("CREATE TABLE cat_t (k int)")
    sess.sql("CREATE VIEW cat_v AS SELECT k FROM cat_t")
    sess.sql(
        "CREATE MATERIALIZED VIEW cat_mv AS SELECT count(*) AS n "
        "FROM cat_t WITH NO DATA"
    )
    tabs = {r.tablename for r in sess.sql(
        "SELECT tablename FROM pg_tables"
    ).collect()}
    assert "cat_t" in tabs
    views = sess.sql(
        "SELECT viewname, definition FROM pg_views "
        "WHERE viewname = 'cat_v'"
    ).collect()
    assert len(views) == 1 and "cat_t" in views[0].definition
    mv = sess.sql(
        "SELECT matviewname, ispopulated FROM pg_catalog.pg_matviews"
    ).collect()
    byname = {r.matviewname: r.ispopulated for r in mv}
    assert byname.get("cat_mv") is False  # WITH NO DATA → unpopulated
    sess.sql("REFRESH MATERIALIZED VIEW cat_mv")
    mv2 = {r.matviewname: r.ispopulated for r in sess.sql(
        "SELECT matviewname, ispopulated FROM pg_matviews"
    ).collect()}
    assert mv2.get("cat_mv") is True


def test_pg_tables_mention_in_literal_no_bypass(sess):
    # a literal mentioning pg_tables must not reroute the statement
    # around the PG rewrite chain (review finding)
    n = sess.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey BETWEEN SYMMETRIC 200 AND 100 "
        "AND o_orderpriority NOT LIKE '%pg_tables%'"
    ).collect()[0].n
    assert n > 0


def test_pg_catalog_views_get_pg_rewrites(sess):
    sess.sql("CREATE TABLE pvt (k int)")
    rows = sess.sql(
        "SELECT tablename FROM pg_tables WHERE tablename SIMILAR TO 'pv_'"
    ).collect()
    assert [r.tablename for r in rows] == ["pvt"]
