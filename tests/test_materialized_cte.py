"""WITH ... AS MATERIALIZED through DistributedSession.sql — forced
CTE materialization (↔ reference cte_inline.c + intermediate
results): the CTE evaluates ONCE into a cached relation; plain CTEs
stay inline for Catalyst."""

import pytest

from citus_spark.plans.rewrites import extract_materialized_ctes
from citus_spark.session import DistributedSession
from tests.conftest import SF_SMALL


def test_extract_mixed_cte_list():
    mat, rest = extract_materialized_ctes(
        """WITH a AS (SELECT 1 AS x),
     b AS MATERIALIZED (SELECT y, count(*) AS n FROM t GROUP BY y),
     c AS (SELECT 2 AS z)
SELECT * FROM a, b, c"""
    )
    assert mat == [("b", "SELECT y, count(*) AS n FROM t GROUP BY y")]
    assert "MATERIALIZED" not in rest
    assert "a AS (SELECT 1 AS x)" in rest and "c AS (SELECT 2 AS z)" in rest
    assert rest.count("WITH") == 1


def test_extract_only_cte_drops_with():
    mat, rest = extract_materialized_ctes(
        "WITH m AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM m"
    )
    assert mat == [("m", "SELECT 1 AS x")]
    assert rest.split() == ["SELECT", "*", "FROM", "m"]


def test_literal_is_never_scanned():
    sql = "SELECT 'x AS MATERIALIZED (' AS s FROM t"
    mat, rest = extract_materialized_ctes(sql)
    assert mat == [] and rest == sql


def test_materialized_cte_executes_and_caches(spark):
    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    out = sess.sql(
        """
        WITH flagged AS MATERIALIZED (
          SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT a.l_returnflag, a.n + b.n AS nn
        FROM flagged a JOIN flagged b ON a.l_returnflag = b.l_returnflag
        ORDER BY a.l_returnflag
        """
    )
    rows = out.collect()
    want = {
        r.l_returnflag: 2 * r.n
        for r in sess.sql(
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY l_returnflag"
        ).collect()
    }
    assert {r.l_returnflag: r.nn for r in rows} == want
    # materialized = scans the cached relation, not the parquet
    plan = (
        spark.table("flagged")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "InMemoryRelation" in plan


def test_materialized_cte_chain(spark):
    """A later MATERIALIZED CTE may reference an earlier one (the
    reference evaluates subplans in dependency order)."""
    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    out = sess.sql(
        """
        WITH base AS MATERIALIZED (
          SELECT o_orderpriority, o_totalprice FROM orders
          WHERE o_totalprice > 1000
        ),
        agg AS MATERIALIZED (
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM base
          GROUP BY o_orderpriority
        )
        SELECT * FROM agg ORDER BY o_orderpriority
        """
    )
    got = {r.o_orderpriority: r.n for r in out.collect()}
    want = {
        r.o_orderpriority: r.n
        for r in sess.sql(
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n "
            "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderpriority"
        ).collect()
    }
    assert got == want and len(got) > 0
