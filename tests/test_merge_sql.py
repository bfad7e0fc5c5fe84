"""Textual MERGE INTO through DistributedSession.sql — the SQL-level
contract the reference exposes (merge_planner.c plans MERGE text; here
plans/merge_sql.py parses it into the merge operator)."""

import pytest
from pyspark.sql import functions as F

from citus_spark.plans.merge_sql import parse_merge
from citus_spark.session import DistributedSession
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, tmp_path):
    path = str(tmp_path / "orders_t")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").write.parquet(path)
    s = DistributedSession(spark)
    s.catalog.register("orders_t", "hash", "o_orderkey", path=path)
    spark.read.parquet(path).createOrReplaceTempView("orders_t")
    return s


def test_parse_merge_clauses():
    stmt = parse_merge(
        """
        MERGE INTO tgt AS t
        USING (SELECT * FROM src WHERE x > 0) s
        ON t.k1 = s.k1 AND t.k2 = s.k2
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert stmt.target == "tgt"
    assert stmt.source_is_subquery and "WHERE x > 0" in stmt.source
    assert stmt.keys == ["k1", "k2"]
    assert stmt.when_matched == "update" and stmt.insert_unmatched

    d = parse_merge(
        "MERGE INTO tgt USING src ON tgt.k = src.k WHEN MATCHED THEN DELETE"
    )
    assert d.source == "src" and not d.source_is_subquery
    assert d.when_matched == "delete" and not d.insert_unmatched

    with pytest.raises(NotImplementedError):
        parse_merge(
            "MERGE INTO tgt USING src ON tgt.a < src.b "
            "WHEN MATCHED THEN DELETE"
        )


def test_sql_merge_upsert(sess, spark):
    before = spark.table("orders_t")
    n_before = before.count()
    src = (
        before.orderBy("o_orderkey")
        .limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    new_rows = (
        before.orderBy("o_orderkey")
        .limit(5)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    doubled = {r.o_orderkey: r.o_totalprice for r in src.collect()}
    # pin the source — its lineage over the target path dies at overwrite
    spark.createDataFrame(
        src.unionByName(new_rows).collect(), src.schema
    ).createOrReplaceTempView("updates_src")

    out = sess.sql(
        """
        MERGE INTO orders_t AS t USING updates_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert out.count() == n_before + 5
    # the refreshed view shows the merged state to plain SQL
    got = {
        r.o_orderkey: r.o_totalprice
        for r in spark.sql(
            "SELECT o_orderkey, o_totalprice FROM orders_t"
        )
        .filter(F.col("o_orderkey").isin(list(doubled)))
        .collect()
    }
    assert got == pytest.approx(doubled)


def test_sql_merge_delete_with_subquery_source(sess, spark):
    n_before = spark.table("orders_t").count()
    out = sess.sql(
        """
        MERGE INTO orders_t t
        USING (SELECT * FROM orders_t ORDER BY o_orderkey LIMIT 7) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN DELETE
        """
    )
    assert out.count() == n_before - 7


def test_sql_merge_requires_catalog_path(spark):
    s = DistributedSession(spark)
    spark.range(3).createOrReplaceTempView("no_path_t")
    with pytest.raises(ValueError, match="storage path"):
        s.sql(
            "MERGE INTO no_path_t USING no_path_t ON "
            "no_path_t.id = no_path_t.id WHEN MATCHED THEN DELETE"
        )
