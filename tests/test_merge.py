"""MERGE INTO (join+rewrite pattern) and materialized intermediate
results."""

import pytest
from pyspark.sql import functions as F

from citus_spark.sources.ingest import merge_into
from tests.conftest import SF_SMALL


@pytest.fixture()
def target(spark, tmp_path):
    path = str(tmp_path / "orders_target")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").write.parquet(path)
    return path


def test_merge_update_and_insert(spark, target):
    before = spark.read.parquet(target)
    n_before = before.count()
    # source: 10 existing orders with doubled price + 5 brand-new rows
    existing = before.orderBy("o_orderkey").limit(10).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    new_rows = before.orderBy("o_orderkey").limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    source = existing.unionByName(new_rows)
    # materialize expectations BEFORE the merge — lineages over the
    # target path are invalid after the overwrite
    doubled = {r.o_orderkey: r.o_totalprice for r in existing.collect()}
    source = spark.createDataFrame(source.collect(), source.schema)

    merge_into(spark, target, source, keys=["o_orderkey"])

    after = spark.read.parquet(target)
    assert after.count() == n_before + 5
    got = {
        r.o_orderkey: r.o_totalprice
        for r in after.filter(F.col("o_orderkey").isin(list(doubled))).collect()
    }
    assert got == pytest.approx(doubled)


def test_merge_delete(spark, target):
    before = spark.read.parquet(target)
    n_before = before.count()
    victims = before.orderBy("o_orderkey").limit(7)
    vk = [r.o_orderkey for r in victims.collect()]  # before the overwrite
    merge_into(
        spark,
        target,
        victims,
        keys=["o_orderkey"],
        when_matched="delete",
        insert_unmatched=False,
    )
    after = spark.read.parquet(target)
    assert after.count() == n_before - 7
    assert after.filter(F.col("o_orderkey").isin(vk)).count() == 0


def test_merge_ignore_keeps_target(spark, target):
    before = spark.read.parquet(target)
    n_before = before.count()
    source = before.orderBy("o_orderkey").limit(3).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    merge_into(
        spark, target, source, keys=["o_orderkey"], when_matched="ignore"
    )
    after = spark.read.parquet(target)
    assert after.count() == n_before
    assert after.filter(F.col("o_totalprice") < 0).count() == 0


def test_materialize_intermediate_result(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    big = sess.sql("SELECT * FROM orders WHERE o_totalprice > 300000")
    sess.materialize("big_orders_ir", big)
    # reuse in two independent queries — scans the cached relation
    a = sess.sql("SELECT count(*) AS n FROM big_orders_ir").collect()[0].n
    b = sess.sql(
        "SELECT count(DISTINCT o_custkey) AS n FROM big_orders_ir"
    ).collect()[0].n
    assert a >= b > 0
    assert sess.spark.table("big_orders_ir").storageLevel.useMemory
