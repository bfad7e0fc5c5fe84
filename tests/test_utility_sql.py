"""TRUNCATE / VACUUM / ANALYZE utility statements (↔ reference
commands/truncate.c, vacuum.c propagation): schema-preserving empty,
file bin-packing, and one-pass column statistics."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess_with_table(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    path = str(tmp_path / "orders_util")
    # many small files on purpose (VACUUM target)
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").repartition(
        17
    ).write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("orders_util")
    s.catalog.register("orders_util", "hash", "o_orderkey", path=path)
    return s, path


def test_vacuum_compacts_files(spark, sess_with_table):
    s, path = sess_with_table
    n0 = spark.table("orders_util").count()
    n_files_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_files_before == 17
    out = s.sql("VACUUM orders_util").collect()
    n_files_after = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert out[0].files == n_files_after < n_files_before
    assert spark.table("orders_util").count() == n0


def test_analyze_returns_column_stats(spark, sess_with_table):
    s, _ = sess_with_table
    stats = {r.column: r for r in s.sql("ANALYZE orders_util").collect()}
    n = spark.table("orders_util").count()
    real_ndv = (
        spark.table("orders_util").select("o_orderkey").distinct().count()
    )
    row = stats["o_orderkey"]
    assert row.n_rows == n and row.n_nulls == 0
    assert abs(row.approx_ndv - real_ndv) / real_ndv < 0.1
    lo = spark.table("orders_util").agg(F.min("o_orderkey")).collect()[0][0]
    assert row.min_value == str(lo)


def test_truncate_keeps_schema_empties_rows(spark, sess_with_table):
    s, _ = sess_with_table
    cols = spark.table("orders_util").columns
    s.sql("TRUNCATE TABLE orders_util")
    assert spark.table("orders_util").count() == 0
    assert spark.table("orders_util").columns == cols


def test_fixture_protected_from_truncate(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    with pytest.raises(ValueError, match="read-only fixture"):
        s.sql("TRUNCATE orders")
    with pytest.raises(ValueError, match="read-only fixture"):
        s.sql("VACUUM orders")
    # ANALYZE is read-only: allowed on fixtures
    n_cols = len(s.spark.table("nation").columns)
    assert s.sql("ANALYZE nation").count() == n_cols


def test_analyze_minmax_is_value_ordered_not_lexicographic(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    # numeric min 9 / max 200: the string-cast ordering would report
    # min '10' and max '9'
    df = spark.createDataFrame([(9,), (10,), (200,)], "v long")
    path = str(tmp_path / "mm")
    df.write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("mm_t")
    s.catalog.register("mm_t", "none", path=path)
    row = {r.column: r for r in s.sql("ANALYZE mm_t").collect()}["v"]
    assert (row.min_value, row.max_value) == ("9", "200")
