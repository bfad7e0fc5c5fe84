"""RETURNING clause on textual UPDATE / DELETE / INSERT
(plans/dml_sql.split_returning + session executors ↔ reference
RETURNING projection shipped per shard, multi_router_planner.c).

PG semantics verified here:
- DELETE .. RETURNING = old image of removed rows
- UPDATE .. RETURNING = NEW image of updated rows, but rows selected
  by the predicate against OLD values (SET x=x+10 WHERE x<5 must
  still return the rows it touched)
- INSERT .. RETURNING = inserted rows (post-cast image)
- ON CONFLICT DO UPDATE .. RETURNING = post-image of every source row
- ON CONFLICT DO NOTHING .. RETURNING = only rows actually inserted
- the projection reads PRE-swap state (staged, not lazily re-read)
"""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    path = str(tmp_path / "orders_ret")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
        "o_orderkey < 2000"
    ).write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("orders_ret")
    s.catalog.register("orders_ret", "hash", "o_orderkey", path=path)
    return s


def test_delete_returning_old_image(spark, sess):
    old = {
        r.o_orderkey: r.o_totalprice
        for r in spark.table("orders_ret")
        .filter("o_orderkey % 7 = 0")
        .collect()
    }
    out = sess.sql(
        "DELETE FROM orders_ret WHERE o_orderkey % 7 = 0 "
        "RETURNING o_orderkey, o_totalprice"
    ).collect()
    assert {r.o_orderkey: r.o_totalprice for r in out} == old
    assert (
        spark.table("orders_ret").filter("o_orderkey % 7 = 0").count() == 0
    )


def test_update_returning_new_image_old_predicate(spark, sess):
    # predicate judged on OLD values; returned rows carry NEW values
    keys = {
        r.o_orderkey
        for r in spark.table("orders_ret")
        .filter("o_totalprice < 50000")
        .collect()
    }
    assert keys  # fixture must exercise the branch
    out = sess.sql(
        "UPDATE orders_ret SET o_totalprice = o_totalprice + 100000 "
        "WHERE o_totalprice < 50000 "
        "RETURNING o_orderkey, o_totalprice AS new_price"
    ).collect()
    assert {r.o_orderkey for r in out} == keys
    assert all(r.new_price >= 100000 for r in out)


def test_update_returning_star(spark, sess):
    out = sess.sql(
        "UPDATE orders_ret SET o_orderpriority = 'x' "
        "WHERE o_orderkey = 1 RETURNING *"
    )
    assert out.columns == spark.table("orders_ret").columns
    rows = out.collect()
    assert len(rows) == 1 and rows[0].o_orderpriority == "x"


def test_returning_expression_and_literal_guard(spark, sess):
    # a quoted literal containing the word RETURNING is not a clause
    sess.sql(
        "UPDATE orders_ret SET o_orderpriority = 'not RETURNING a clause' "
        "WHERE o_orderkey = 2"
    )
    row = (
        spark.table("orders_ret").filter("o_orderkey = 2").collect()[0]
    )
    assert row.o_orderpriority == "not RETURNING a clause"
    # expressions (not just columns) in the RETURNING list
    out = sess.sql(
        "DELETE FROM orders_ret WHERE o_orderkey = 3 "
        "RETURNING o_orderkey * 10 AS k10"
    ).collect()
    assert [r.k10 for r in out] == [30]


def test_insert_values_returning(spark, sess):
    out = sess.sql(
        "INSERT INTO orders_ret (o_orderkey, o_custkey, o_totalprice) "
        "VALUES (990001, 7, 12.5), (990002, 8, 99.0) "
        "RETURNING o_orderkey, o_totalprice"
    ).collect()
    assert sorted((r.o_orderkey, r.o_totalprice) for r in out) == [
        (990001, 12.5),
        (990002, 99.0),
    ]
    assert (
        spark.table("orders_ret").filter("o_orderkey >= 990001").count()
        == 2
    )


def test_insert_on_conflict_update_returning_post_image(spark, sess):
    before = (
        spark.table("orders_ret").filter("o_orderkey = 1").collect()[0]
    )
    out = sess.sql(
        "INSERT INTO orders_ret (o_orderkey, o_custkey, o_totalprice) "
        "VALUES (1, 0, 1000.0), (990010, 9, 5.0) "
        "ON CONFLICT (o_orderkey) DO UPDATE SET "
        "o_totalprice = t.o_totalprice + EXCLUDED.o_totalprice "
        "RETURNING o_orderkey, o_totalprice"
    ).collect()
    got = {r.o_orderkey: r.o_totalprice for r in out}
    # both source rows come back: the updated post-image and the insert
    assert got[1] == pytest.approx(before.o_totalprice + 1000.0)
    assert got[990010] == 5.0


def test_insert_on_conflict_nothing_returning_only_inserted(spark, sess):
    out = sess.sql(
        "INSERT INTO orders_ret (o_orderkey, o_custkey, o_totalprice) "
        "VALUES (1, 0, 1000.0), (990020, 9, 5.0) "
        "ON CONFLICT (o_orderkey) DO NOTHING "
        "RETURNING o_orderkey"
    ).collect()
    assert [r.o_orderkey for r in out] == [990020]


def test_returning_is_pre_swap_not_lazy(spark, sess):
    # the returned DataFrame must stay valid and stable after the
    # copy-on-write swap replaced the files it was derived from
    out = sess.sql(
        "DELETE FROM orders_ret WHERE o_orderkey % 2 = 0 "
        "RETURNING o_orderkey"
    )
    first = sorted(r.o_orderkey for r in out.collect())
    # a second action re-reads the staged copy, not the live table
    again = sorted(r.o_orderkey for r in out.collect())
    assert first == again and first and all(k % 2 == 0 for k in first)


def test_merge_returning_actions(spark, sess):
    # PG 17 MERGE .. RETURNING merge_action(): updates return the new
    # image, inserts their row, with the action name alongside
    spark.sql(
        "SELECT 1 AS o_orderkey, 111.0 AS delta UNION ALL "
        "SELECT 990030, 7.5"
    ).createOrReplaceTempView("merge_src_ret")
    before = (
        spark.table("orders_ret").filter("o_orderkey = 1").collect()[0]
    )
    out = sess.sql(
        "MERGE INTO orders_ret t USING merge_src_ret s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET "
        "o_totalprice = t.o_totalprice + s.delta "
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) "
        "VALUES (s.o_orderkey, s.delta) "
        "RETURNING merge_action(), o_orderkey, o_totalprice"
    ).collect()
    got = {r.o_orderkey: (r.merge_action, r.o_totalprice) for r in out}
    assert got[1] == ("UPDATE", pytest.approx(before.o_totalprice + 111.0))
    assert got[990030] == ("INSERT", 7.5)
    # the table itself reflects the merge
    assert (
        spark.table("orders_ret").filter("o_orderkey = 990030").count()
        == 1
    )


def test_merge_returning_delete_old_image(spark, sess):
    old = spark.table("orders_ret").filter("o_orderkey = 4").collect()[0]
    spark.sql("SELECT 4 AS o_orderkey").createOrReplaceTempView(
        "merge_del_ret"
    )
    out = sess.sql(
        "MERGE INTO orders_ret t USING merge_del_ret s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN DELETE "
        "RETURNING merge_action() AS act, *"
    ).collect()
    assert len(out) == 1
    assert out[0].act == "DELETE"
    assert out[0].o_totalprice == old.o_totalprice
    assert "__citus_merge_action" not in out[0].asDict()
    assert spark.table("orders_ret").filter("o_orderkey = 4").count() == 0
