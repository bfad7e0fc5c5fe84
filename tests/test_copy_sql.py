"""Textual COPY through the SQL front door (plans/copy_sql.py ↔
reference multi_copy.c): FROM appends under the target schema, TO
exports relations and queries, formats/HEADER options honored, counts
returned, fixture tables protected."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess_with_table(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    path = str(tmp_path / "nation_copy")
    spark.read.parquet(f"{SF_SMALL}/nation.parquet").write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("nation_copy")
    s.catalog.register("nation_copy", "hash", "n_nationkey", path=path)
    return s


def test_copy_to_and_back(spark, sess_with_table, tmp_path):
    s = sess_with_table
    n0 = spark.table("nation_copy").count()
    out_csv = str(tmp_path / "out_csv")

    exported = s.sql(
        f"COPY nation_copy TO '{out_csv}' WITH (FORMAT csv, HEADER)"
    ).collect()
    assert exported[0].copied == n0

    # round-trip: append the export back → table doubles (HEADER must
    # be stated on both sides — the default is OFF, like PostgreSQL)
    copied = s.sql(
        f"COPY nation_copy FROM '{out_csv}' WITH (HEADER)"
    ).collect()
    assert copied[0].copied == n0
    assert spark.table("nation_copy").count() == 2 * n0


def test_copy_headerless_default_roundtrip(spark, sess_with_table, tmp_path):
    s = sess_with_table
    n0 = spark.table("nation_copy").count()
    out = str(tmp_path / "no_header")
    # no HEADER mentioned anywhere: psql-style headerless files
    assert s.sql(f"COPY nation_copy TO '{out}'").collect()[0].copied == n0
    assert s.sql(f"COPY nation_copy FROM '{out}'").collect()[0].copied == n0
    assert spark.table("nation_copy").count() == 2 * n0


def test_copy_query_to_jsonl(spark, sess_with_table, tmp_path):
    s = sess_with_table
    out = str(tmp_path / "out_jsonl")
    res = s.sql(
        "COPY (SELECT n_nationkey, n_name FROM nation_copy "
        f"WHERE n_nationkey < 10) TO '{out}' WITH (FORMAT jsonl)"
    ).collect()
    assert res[0].copied == 10
    back = spark.read.json(out)
    assert back.count() == 10
    assert set(back.columns) == {"n_nationkey", "n_name"}


def test_copy_from_fixture_protected(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    with pytest.raises(ValueError, match="read-only fixture"):
        s.sql("COPY nation FROM '/tmp/whatever.csv'")


def test_copy_parser():
    from citus_spark.plans.copy_sql import is_copy, parse_copy

    assert not is_copy("SELECT 1")
    assert not is_copy("COPY broken")
    stmt = parse_copy("COPY t FROM '/x/y.csv' WITH (FORMAT csv, HEADER false)")
    assert (stmt.direction, stmt.table, stmt.fmt, stmt.header) == (
        "from", "t", "csv", False,
    )
    stmt = parse_copy("COPY (SELECT a FROM t WHERE b IN (1,2)) TO '/o'")
    assert stmt.query == "SELECT a FROM t WHERE b IN (1,2)"
    with pytest.raises(ValueError, match="only supports TO"):
        parse_copy("COPY (SELECT 1) FROM '/x'")
    with pytest.raises(ValueError, match="unknown option"):
        parse_copy("COPY t TO '/x' WITH (DELIMITER '|')")
