"""Textual UPDATE/DELETE through the SQL front door (plans/dml_sql.py
↔ reference DML routing): copy-on-write semantics, simultaneous SET
assignment, NULL-predicate rows untouched, affected-count tags, and
the read-only-fixture guard."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess_with_table(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    path = str(tmp_path / "orders_dml")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
        "o_orderkey < 2000"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    df.createOrReplaceTempView("orders_dml")
    s.catalog.register("orders_dml", "hash", "o_orderkey", path=path)
    return s


def test_delete_where(spark, sess_with_table):
    s = sess_with_table
    n0 = spark.table("orders_dml").count()
    n_even = spark.table("orders_dml").filter("o_orderkey % 2 = 0").count()
    out = s.sql("DELETE FROM orders_dml WHERE o_orderkey % 2 = 0").collect()
    assert out[0].deleted == n_even
    assert spark.table("orders_dml").count() == n0 - n_even
    assert (
        spark.table("orders_dml").filter("o_orderkey % 2 = 0").count() == 0
    )


def test_update_simultaneous_assignment(spark, sess_with_table):
    s = sess_with_table
    before = {
        r.o_orderkey: (r.o_totalprice, r.o_custkey)
        for r in spark.table("orders_dml").collect()
    }
    # swap-flavored update: both SET exprs must read OLD values
    out = s.sql(
        "UPDATE orders_dml SET o_totalprice = o_custkey, "
        "o_custkey = CAST(o_totalprice AS BIGINT) "
        "WHERE o_orderkey % 3 = 0"
    ).collect()
    n_hit = sum(1 for k in before if k % 3 == 0)
    assert out[0].updated == n_hit
    after = {
        r.o_orderkey: (r.o_totalprice, r.o_custkey)
        for r in spark.table("orders_dml").collect()
    }
    for k, (price, cust) in before.items():
        if k % 3 == 0:
            assert after[k] == (float(cust), int(price))
        else:
            assert after[k] == (price, cust)


def test_null_predicate_rows_unaffected(spark, sess_with_table):
    s = sess_with_table
    n0 = spark.table("orders_dml").count()
    # predicate NULL for every row (NULL = NULL is NULL) → no-op
    out = s.sql(
        "DELETE FROM orders_dml WHERE CAST(NULL AS BOOLEAN)"
    ).collect()
    assert out[0].deleted == 0
    assert spark.table("orders_dml").count() == n0


def test_update_without_where_touches_all(spark, sess_with_table):
    s = sess_with_table
    n0 = spark.table("orders_dml").count()
    out = s.sql(
        "UPDATE orders_dml SET o_orderstatus = concat(o_orderstatus, 'X')"
    ).collect()
    assert out[0].updated == n0
    assert (
        spark.table("orders_dml")
        .filter(~F.col("o_orderstatus").endswith("X"))
        .count()
        == 0
    )


def test_fixture_tables_are_protected(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    with pytest.raises(ValueError, match="read-only fixture"):
        s.sql("DELETE FROM orders WHERE o_orderkey = 1")
    with pytest.raises(ValueError, match="read-only fixture"):
        s.sql("UPDATE orders SET o_totalprice = 0 WHERE o_orderkey = 1")


def test_parser_rejects_garbage():
    from citus_spark.plans.dml_sql import is_dml, parse_dml

    assert not is_dml("SELECT * FROM t")
    assert not is_dml("MERGE INTO t USING s ON t.k = s.k")
    stmt = parse_dml(
        "UPDATE t SET a = f(x, y), b = 'lit,eral' WHERE c > 0"
    )
    assert stmt.assignments == [("a", "f(x, y)"), ("b", "'lit,eral'")]
    with pytest.raises(ValueError, match="assignment"):
        parse_dml("UPDATE t SET nonsense WHERE c > 0")


def test_update_from_and_delete_using(spark):
    """PG join-DML (↔ reference modify planner UPDATE/DELETE with
    joins): UPDATE .. FROM applies joined assignments to matched rows
    only; DELETE .. USING removes rows with >=1 match."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("CREATE TABLE acc_dml (id int, balance int, seg text)")
    s.sql(
        "INSERT INTO acc_dml VALUES (1, 100, 'a'), (2, 200, 'b'), "
        "(3, 300, 'c')"
    )
    s.sql("CREATE TABLE adj_dml (id int, delta int)")
    s.sql("INSERT INTO adj_dml VALUES (1, 10), (3, -50)")
    r = s.sql(
        "UPDATE acc_dml SET balance = acc_dml.balance + adj_dml.delta "
        "FROM adj_dml WHERE acc_dml.id = adj_dml.id"
    )
    assert r.collect()[0][0] == 2
    got = {x.id: x.balance for x in spark.table("acc_dml").collect()}
    assert got == {1: 110, 2: 200, 3: 250}
    # alias form, extra source predicate, RETURNING the new image
    r = s.sql(
        "UPDATE acc_dml AS a SET seg = 'x' FROM adj_dml d "
        "WHERE a.id = d.id AND d.delta > 0 RETURNING id, seg"
    )
    assert [(x.id, x.seg) for x in r.collect()] == [(1, "x")]
    # several source matches: the applied value is deterministic
    # (min over computed values — PG leaves it unspecified)
    s.sql("INSERT INTO adj_dml VALUES (2, 7), (2, 3)")
    s.sql(
        "UPDATE acc_dml SET balance = adj_dml.delta FROM adj_dml "
        "WHERE acc_dml.id = adj_dml.id AND acc_dml.id = 2"
    )
    assert (
        spark.table("acc_dml").filter("id = 2").collect()[0].balance == 3
    )
    r = s.sql(
        "DELETE FROM acc_dml USING adj_dml "
        "WHERE acc_dml.id = adj_dml.id AND adj_dml.delta < 0"
    )
    assert r.collect()[0][0] == 1
    assert sorted(
        x.id for x in spark.table("acc_dml").collect()
    ) == [1, 2]
    # a FROM inside a scalar-subquery SET expression does NOT split
    # the statement (depth-0 keyword scan)
    s.sql(
        "UPDATE acc_dml SET balance = "
        "(SELECT max(delta) FROM adj_dml WHERE delta > 0) WHERE id = 1"
    )
    assert (
        spark.table("acc_dml").filter("id = 1").collect()[0].balance == 10
    )
    s.sql("DROP TABLE acc_dml")
    s.sql("DROP TABLE adj_dml")
