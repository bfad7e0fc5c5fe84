"""Textual INSERT through the front door (plans/insert_sql.py):
multi-row VALUES, INSERT..SELECT, and the reference's rollup idiom
INSERT..SELECT ON CONFLICT DO UPDATE (↔ distributed/README.md
real-time analytics pattern)."""

import pytest
from pyspark.sql import functions as F

from citus_spark.session import DistributedSession
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, tmp_path):
    path = str(tmp_path / "rollup_t")
    spark.createDataFrame(
        [(1, 10.0, 2), (2, 20.0, 1)],
        "k int, total double, n int",
    ).write.parquet(path)
    s = DistributedSession(spark)
    s.catalog.register("rollup_t", "hash", "k", path=path)
    spark.read.parquet(path).createOrReplaceTempView("rollup_t")
    return s


def test_multirow_values_insert(sess, spark):
    out = sess.sql(
        "INSERT INTO rollup_t VALUES (3, 30.0, 5), (4, 40.5, 7)"
    ).collect()
    assert out[0].inserted == 2
    got = {r.k: (r.total, r.n) for r in spark.table("rollup_t").collect()}
    assert got[3] == (30.0, 5) and got[4] == (40.5, 7) and len(got) == 4


def test_insert_column_subset_null_fills(sess, spark):
    sess.sql("INSERT INTO rollup_t (k, total) VALUES (9, 90.0)")
    row = spark.table("rollup_t").filter("k = 9").collect()[0]
    assert row.total == 90.0 and row.n is None


def test_insert_select_on_conflict_do_update(sess, spark):
    """The rollup idiom: re-aggregating deltas into an existing
    rollup row via EXCLUDED references."""
    spark.createDataFrame(
        [(1, 5.0, 1), (3, 7.0, 4)], "k int, total double, n int"
    ).createOrReplaceTempView("delta_src")
    out = sess.sql(
        """
        INSERT INTO rollup_t (k, total, n)
        SELECT k, total, n FROM delta_src
        ON CONFLICT (k) DO UPDATE SET
          total = t.total + EXCLUDED.total,
          n = t.n + EXCLUDED.n
        """
    ).collect()
    assert out[0].inserted == 2
    got = {r.k: (r.total, r.n) for r in spark.table("rollup_t").collect()}
    assert got[1] == (15.0, 3)   # merged: 10+5, 2+1
    assert got[2] == (20.0, 1)   # untouched
    assert got[3] == (7.0, 4)    # fresh insert


def test_insert_on_conflict_do_nothing(sess, spark):
    sess.sql(
        "INSERT INTO rollup_t VALUES (1, 999.0, 999), (8, 80.0, 8) "
        "ON CONFLICT (k) DO NOTHING"
    )
    got = {r.k: (r.total, r.n) for r in spark.table("rollup_t").collect()}
    assert got[1] == (10.0, 2)  # conflict kept the existing row
    assert got[8] == (80.0, 8)  # new row landed


def test_insert_noncatalog_falls_through(sess, spark):
    """INSERT INTO a table we don't own must reach Spark's own
    handling (its honest error for temp views), not ours."""
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "not_ours"
    )
    with pytest.raises(Exception):
        sess.sql("INSERT INTO not_ours VALUES (2)")
    # the fixture guard still protects read-only storage
    sess2 = DistributedSession(spark)
    sess2.load_tables(SF_SMALL)
    with pytest.raises(ValueError, match="read-only"):
        sess2.sql("INSERT INTO orders VALUES (1)")


def test_insert_unmodeled_form_clear_error_and_fallthrough(sess, spark):
    """PARTITION-spec inserts: catalog targets get a clear error;
    non-catalog targets reach Spark's own handling."""
    with pytest.raises(ValueError, match="not modeled"):
        sess.sql("INSERT INTO rollup_t PARTITION (p=1) SELECT 1, 2.0, 3")
    # non-catalog: falls through (Spark raises its own error for a
    # temp view, not our 'not modeled' message)
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("nc_t")
    with pytest.raises(Exception) as ei:
        sess.sql("INSERT INTO nc_t PARTITION (p=1) SELECT 1")
    assert "not modeled" not in str(ei.value)


def test_on_conflict_duplicate_proposed_rows_rejected(sess, spark):
    import pytest as _pt

    with _pt.raises(Exception, match="second time|duplicate"):
        sess.sql(
            "INSERT INTO rollup_t VALUES (1, 1.0, 1), (1, 2.0, 2) "
            "ON CONFLICT (k) DO UPDATE SET total = EXCLUDED.total"
        )


def test_on_conflict_do_update_where_guard(spark):
    """PG conditional upsert: DO UPDATE .. WHERE updates only guard-
    passing conflicting rows; the rest keep their OLD image and are
    excluded from RETURNING."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ocw_t")
    s.sql("CREATE TABLE ocw_t (id bigint, v bigint)")
    s.sql("INSERT INTO ocw_t VALUES (1, 10), (2, 200)")
    r = s.sql(
        "INSERT INTO ocw_t VALUES (1, 5), (2, 5), (3, 5) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v "
        "WHERE ocw_t.v < 100 RETURNING id, v"
    ).collect()
    assert sorted(tuple(x) for x in r) == [(1, 5), (3, 5)]
    got = sorted(
        tuple(x) for x in s.sql("SELECT * FROM ocw_t").collect()
    )
    assert got == [(1, 5), (2, 200), (3, 5)]
    # a WHERE inside an assignment subquery is NOT the guard
    s.sql(
        "INSERT INTO ocw_t VALUES (2, 7) ON CONFLICT (id) DO UPDATE "
        "SET v = (SELECT max(v) FROM ocw_t WHERE id <> 2)"
    )
    assert (
        s.sql("SELECT v FROM ocw_t WHERE id = 2").collect()[0][0] == 5
    )


def test_on_conflict_where_unqualified_target_columns(spark):
    """PG scoping: a bare identifier in the DO UPDATE guard is the
    existing target row (review fix: it hit AMBIGUOUS_REFERENCE)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS oq_t")
    s.sql("CREATE TABLE oq_t (id bigint, v bigint)")
    s.sql("INSERT INTO oq_t VALUES (1, 10), (2, 200)")
    r = s.sql(
        "INSERT INTO oq_t VALUES (1, 99), (2, 99) ON CONFLICT (id) "
        "DO UPDATE SET v = excluded.v WHERE v < 100 RETURNING id, v"
    ).collect()
    assert sorted(tuple(x) for x in r) == [(1, 99)]
    got = sorted(tuple(x) for x in s.sql("SELECT * FROM oq_t").collect())
    assert got == [(1, 99), (2, 200)]


def test_on_conflict_guard_niladic_keywords(spark):
    """CURRENT_TIMESTAMP / CURRENT_DATE etc. in a DO UPDATE guard are
    niladic SQL functions, not target columns — they must NOT be
    qualified as t.CURRENT_TIMESTAMP (review fix)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS nk_t")
    s.sql("CREATE TABLE nk_t (id bigint, updated_at timestamp, v bigint)")
    s.sql(
        "INSERT INTO nk_t VALUES "
        "(1, TIMESTAMP '2020-01-01 00:00:00', 10), "
        "(2, TIMESTAMP '2999-01-01 00:00:00', 20)"
    )
    s.sql(
        "INSERT INTO nk_t VALUES (1, TIMESTAMP '2021-06-01 00:00:00', 11),"
        " (2, TIMESTAMP '2021-06-01 00:00:00', 21) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v "
        "WHERE nk_t.updated_at < CURRENT_TIMESTAMP"
    )
    got = sorted(
        tuple(x) for x in s.sql("SELECT id, v FROM nk_t").collect()
    )
    # row 1 is stale (2020 < now) -> updated; row 2 is future -> kept
    assert got == [(1, 11), (2, 20)]
    # bare-identifier guard mixing a column with CURRENT_DATE
    s.sql(
        "INSERT INTO nk_t VALUES (1, TIMESTAMP '2022-01-01 00:00:00', 99)"
        " ON CONFLICT (id) DO UPDATE SET v = excluded.v "
        "WHERE updated_at < CURRENT_DATE"
    )
    assert s.sql("SELECT v FROM nk_t WHERE id = 1").collect()[0][0] == 99
