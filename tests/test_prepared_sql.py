"""PREPARE/EXECUTE/DEALLOCATE and cursor DECLARE/FETCH/MOVE/CLOSE
(plans/prepared_sql.py ↔ reference multi_prepare_sql.sql and the
cursor regress suites)."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_prepare_execute_roundtrip(spark, sess):
    sess.sql(
        "PREPARE top_orders (int) AS "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey = $1 ORDER BY o_orderkey"
    )
    for cust in (1, 2):
        got = sess.sql(f"EXECUTE top_orders ({cust})").collect()
        want = spark.sql(
            f"SELECT o_orderkey, o_totalprice FROM orders "
            f"WHERE o_custkey = {cust} ORDER BY o_orderkey"
        ).collect()
        assert got == want and want  # repeated EXECUTE, new params


def test_prepare_typed_cast_and_param_reuse(sess):
    # $1 twice, type list applies the cast
    sess.sql(
        "PREPARE price_window (double) AS "
        "SELECT count(*) AS c FROM orders "
        "WHERE o_totalprice BETWEEN $1 AND $1 + 50000"
    )
    c = sess.sql("EXECUTE price_window (100000)").collect()[0].c
    assert c > 0


def test_prepare_errors(sess):
    sess.sql("PREPARE p1 AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("PREPARE p1 AS SELECT 2 AS two")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("EXECUTE nope")
    with pytest.raises(ValueError, match=r"\$2"):
        sess.sql("PREPARE p2 AS SELECT $2 AS x")
        sess.sql("EXECUTE p2 (1)")
    sess.sql("DEALLOCATE p1")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("EXECUTE p1")
    sess.sql("PREPARE p1 AS SELECT 3 AS three")  # name free again
    assert sess.sql("EXECUTE p1").collect()[0].three == 3
    sess.sql("DEALLOCATE ALL")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("EXECUTE p1")


def test_dollar_in_literal_untouched(sess):
    sess.sql("PREPARE lit AS SELECT '$1' AS s, $1 AS v")
    row = sess.sql("EXECUTE lit (42)").collect()[0]
    assert row.s == "$1" and row.v == 42


def test_prepared_dml_executes(spark, sess, tmp_path):
    path = str(tmp_path / "orders_prep")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
        "o_orderkey < 500"
    ).write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("orders_prep")
    sess.catalog.register("orders_prep", "hash", "o_orderkey", path=path)
    sess.sql(
        "PREPARE bump (bigint) AS UPDATE orders_prep "
        "SET o_totalprice = o_totalprice + 1 WHERE o_orderkey = $1"
    )
    before = (
        spark.table("orders_prep").filter("o_orderkey = 1").collect()[0]
    )
    out = sess.sql("EXECUTE bump (1)").collect()
    assert out[0].updated == 1
    after = (
        spark.table("orders_prep").filter("o_orderkey = 1").collect()[0]
    )
    assert after.o_totalprice == pytest.approx(before.o_totalprice + 1)


def test_cursor_fetch_stream(spark, sess):
    sess.sql(
        "DECLARE c1 CURSOR FOR "
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
    )
    first = [r.o_orderkey for r in sess.sql("FETCH 5 FROM c1").collect()]
    nxt = [r.o_orderkey for r in sess.sql("FETCH NEXT FROM c1").collect()]
    want = [
        r.o_orderkey
        for r in spark.sql(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 6"
        ).collect()
    ]
    assert first + nxt == want  # fetches continue, never restart
    sess.sql("MOVE 3 FROM c1")
    after_move = sess.sql("FETCH 1 FROM c1").collect()[0].o_orderkey
    want_after = spark.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "LIMIT 1 OFFSET 9"
    ).collect()[0].o_orderkey
    assert after_move == want_after
    sess.sql("CLOSE c1")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("FETCH 1 FROM c1")


def test_cursor_fetch_all_and_exhaustion(spark, sess):
    sess.sql(
        "DECLARE tiny CURSOR FOR "
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 7"
    )
    assert len(sess.sql("FETCH 4 FROM tiny").collect()) == 4
    assert len(sess.sql("FETCH ALL FROM tiny").collect()) == 3
    # exhausted cursor yields empty with the original schema
    empty = sess.sql("FETCH 2 FROM tiny")
    assert empty.collect() == [] and empty.columns == ["o_orderkey"]
    sess.sql("CLOSE ALL")
