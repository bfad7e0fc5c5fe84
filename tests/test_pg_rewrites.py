"""ANSI/PG spellings added to the SQL front door in this session
(plans/rewrites.py): OFFSET .. FETCH, TABLESAMPLE SYSTEM/BERNOULLI,
and SIMILAR TO. Each is invalid Spark SQL, so the rewrites are
unconditional and can never change a working query."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def pg_sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_fetch_first_and_offset(spark, pg_sess):
    rows = pg_sess.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "OFFSET 5 ROWS FETCH FIRST 3 ROWS ONLY"
    ).collect()
    plain = spark.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "LIMIT 3 OFFSET 5"
    ).collect()
    assert [r.o_orderkey for r in rows] == [r.o_orderkey for r in plain]
    # FETCH FIRST ROW ONLY defaults the count to 1
    one = pg_sess.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "FETCH FIRST ROW ONLY"
    ).collect()
    assert len(one) == 1
    with pytest.raises(ValueError, match="WITH TIES"):
        pg_sess.sql(
            "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
            "FETCH FIRST 3 ROWS WITH TIES"
        )


def test_pg_tablesample_spelling(pg_sess):
    n = pg_sess.sql(
        "SELECT count(*) AS c FROM orders "
        "TABLESAMPLE BERNOULLI (10) REPEATABLE (7)"
    ).collect()[0].c
    total = pg_sess.sql("SELECT count(*) AS c FROM orders").collect()[0].c
    assert 0 < n < total  # a real sample, not all/none


def test_similar_to_semantics(pg_sess):
    got = pg_sess.sql(
        "SELECT o_orderpriority FROM orders "
        "WHERE o_orderpriority SIMILAR TO '_-URGENT' LIMIT 5"
    ).collect()
    assert got and all(r.o_orderpriority == "1-URGENT" for r in got)
    # '.' is literal in SIMILAR TO, not regex-any
    none = pg_sess.sql(
        "SELECT o_orderpriority FROM orders "
        "WHERE o_orderpriority SIMILAR TO '1.URGENT' LIMIT 1"
    ).collect()
    assert none == []
    # a string literal containing the keyword is not an operator
    lit = pg_sess.sql(
        "SELECT 'x SIMILAR TO y' AS s FROM orders LIMIT 1"
    ).collect()
    assert lit[0].s == "x SIMILAR TO y"
