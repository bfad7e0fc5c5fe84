"""PG-dialect surface through the SQL front door (↔ reference regress
scripts: multi_select_distinct.sql uses DISTINCT ON heavily, and the
regex/LIKE operator family (~, ~*, ~~, ILIKE) appears throughout).
The semantics already existed as DataFrame forms; these tests pin the
TEXTUAL acceptance added in plans/rewrites.py."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_distinct_on_textual_matches_duckdb(spark, duck):
    sql = """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_totalprice DESC
    """
    got = sorted(tuple(r) for r in _sess(spark).sql(sql).collect())
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert len(got) > 0
    assert got == want


def test_distinct_on_ordinals_and_limit(spark, duck):
    # the regress scripts' dominant spelling: ordinal keys + ORDER BY
    sql = """
    SELECT DISTINCT ON (l_orderkey) l_orderkey, l_partkey, l_suppkey
    FROM lineitem WHERE l_orderkey < 35 ORDER BY 1, 2, 3
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = duck.execute(sql).fetchall()
    assert got == [tuple(r) for r in want]
    # result arrives already ordered by the keys
    assert got == sorted(got)


def test_distinct_on_expression_key(spark, duck):
    sql = """
    SELECT DISTINCT ON (l_orderkey % 5) l_orderkey, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey % 5, l_extendedprice DESC, l_orderkey
    """
    got = sorted(tuple(r) for r in _sess(spark).sql(sql).collect())
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want


def test_regex_operators(spark):
    sess = _sess(spark)
    n_tilde = sess.sql(
        "SELECT count(*) AS n FROM documents WHERE text ~ 'data'"
    ).collect()[0].n
    n_ref = (
        spark.table("documents")
        .filter(F.col("text").rlike("data"))
        .count()
    )
    assert n_tilde == n_ref and n_tilde > 0
    # case-insensitive ~* ≡ rlike with (?i)
    n_ci = sess.sql(
        "SELECT count(*) AS n FROM documents WHERE text ~* 'DATA'"
    ).collect()[0].n
    assert n_ci == spark.table("documents").filter(
        F.col("text").rlike("(?i)DATA")
    ).count()
    assert n_ci >= n_tilde
    # negation and the LIKE-family spellings
    n_not = sess.sql(
        "SELECT count(*) AS n FROM documents WHERE text !~ 'data'"
    ).collect()[0].n
    assert n_not == spark.table("documents").count() - n_tilde
    n_like = sess.sql(
        "SELECT count(*) AS n FROM documents WHERE text ~~ '%data%'"
    ).collect()[0].n
    assert n_like == n_tilde  # fixed substring: regex ≡ LIKE


def test_tilde_in_string_literal_untouched(spark):
    sess = _sess(spark)
    row = sess.sql("SELECT '~ not an operator' AS s").collect()[0]
    assert row.s == "~ not an operator"


def test_ilike_passthrough(spark):
    sess = _sess(spark)
    n = sess.sql(
        "SELECT count(*) AS n FROM documents WHERE lang ILIKE 'E%'"
    ).collect()[0].n
    assert n == spark.table("documents").filter(
        F.lower("lang").startswith("e")
    ).count()


def test_interval_abbreviations(spark):
    sess = _sess(spark)
    row = sess.sql(
        "SELECT DATE'2024-01-31' + INTERVAL '1 mon' AS d, "
        "TIMESTAMP'2024-01-01 00:00:00' + INTERVAL '2 hrs 5 mins' AS t"
    ).collect()[0]
    assert str(row.d) == "2024-02-29"
    assert str(row.t) == "2024-01-01 02:05:00"
    # literal content elsewhere untouched
    row = sess.sql("SELECT '1 mon' AS s").collect()[0]
    assert row.s == "1 mon"


def test_generate_series_from_position(spark, duck):
    sql = """
    SELECT g AS bucket, count(o_orderkey) AS n
    FROM generate_series(0, 9) AS t(g)
    LEFT JOIN orders ON o_orderkey % 10 = g
    GROUP BY g ORDER BY g
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) == 10


def test_generate_series_step_and_bare_alias(spark):
    sess = _sess(spark)
    rows = sess.sql(
        "SELECT generate_series AS v FROM generate_series(2, 8, 2)"
    ).collect()
    assert [r.v for r in rows] == [2, 4, 6, 8]


def test_json_operators(spark, duck):
    sql = """
    SELECT event_id, props ->> 'k' AS k
    FROM events WHERE CAST(props ->> 'k' AS BIGINT) > 90
    ORDER BY event_id
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) > 0


def test_json_arrow_chain_pg_compat(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("SET citus.pg_compat = on")
    row = s.sql(
        "SELECT '{\"a\": {\"b\": 7}, \"c\": [4, 5]}' -> 'a' ->> 'b' AS b, "
        "'{\"c\": [4, 5]}' -> 'c' ->> 1 AS c1"
    ).collect()[0]
    assert (row.b, row.c1) == ("7", "5")


def test_lambda_arrow_not_hijacked(spark):
    sess = _sess(spark)
    row = sess.sql(
        "SELECT filter(array(1, 5, 9), x -> x > 3) AS f, "
        "transform(array(1), x -> 'lit') AS t"
    ).collect()[0]
    assert row.f == [5, 9] and row.t == ["lit"]


# -- review-fix regressions


def test_distinct_on_inside_cte(spark, duck):
    sql = """
    WITH w AS (
      SELECT DISTINCT ON (o_custkey) o_custkey, o_totalprice
      FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    )
    SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           AS DOUBLE) AS s
    FROM w
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want


def test_distinct_on_limit_with_unprojected_order_col(spark, duck):
    """ORDER BY columns outside the select list must still drive the
    LIMIT row selection (carried through as hidden columns)."""
    sql = """
    SELECT DISTINCT ON (o_custkey) o_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    LIMIT 7
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) == 7


def test_generate_series_select_list_untouched(spark):
    from citus_spark.plans.rewrites import pg_generate_series

    sql = "SELECT a, generate_series(1,3) FROM t"
    assert pg_generate_series(sql) == sql


def test_generate_series_second_occurrence_rewrites(spark, duck):
    sql = "SELECT sum(g) AS s FROM generate_series(1, 4) AS t(g)"
    # a red herring in a string literal plus the real FROM call
    sql2 = "SELECT 'generate_series(9,9)' AS lit, g FROM generate_series(1,2) t(g) ORDER BY g"
    got = [tuple(r) for r in _sess(spark).sql(sql2).collect()]
    want = [tuple(r) for r in duck.execute(sql2).fetchall()]
    assert got == want
    assert _sess(spark).sql(sql).collect()[0].s == 10


def test_generate_series_correlated_lateral(spark, duck):
    """Correlated bounds work through the LATERAL wrapping (DuckDB's
    own generate_series table function rejects lateral columns, so
    the oracle uses its UNNEST(range()) equivalent)."""
    sql = """
    SELECT o_orderkey, count(*) AS n
    FROM orders, generate_series(1, CAST(o_orderkey % 3 + 1 AS INT)) s(g)
    WHERE o_orderkey < 20
    GROUP BY o_orderkey ORDER BY o_orderkey
    """
    duck_sql = """
    SELECT o_orderkey, count(*) AS n
    FROM orders, UNNEST(range(1, CAST(o_orderkey % 3 + 2 AS INT))) s(g)
    WHERE o_orderkey < 20
    GROUP BY o_orderkey ORDER BY o_orderkey
    """
    got = [tuple(r) for r in _sess(spark).sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(duck_sql).fetchall()]
    assert got == want and len(got) > 0


def test_json_halfchain_not_corrupted(spark):
    """pg_compat OFF: a chain starting with a bare `->` must be left
    WHOLE (failing loudly), never partially rewritten."""
    from citus_spark.plans.rewrites import pg_json_ops

    sql = "SELECT props -> 'a' ->> 'b' FROM e"
    assert pg_json_ops(sql, allow_single_arrow=False) == sql


def test_select_into(spark):
    """PG `SELECT … INTO t FROM …` materializes a catalog table; the
    new relation is immediately queryable AND writable (DML routes to
    its storage)."""
    import pytest

    sess = _sess(spark)
    out = sess.sql(
        "SELECT o_custkey, o_totalprice INTO top_orders "
        "FROM orders WHERE o_totalprice > 100000"
    ).collect()
    n = spark.table("top_orders").count()
    assert out[0].selected == n > 0
    assert sess.catalog.get("top_orders") is not None
    # duplicate target errors like PG
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("SELECT 1 AS x INTO top_orders FROM orders")
    # the materialized relation takes DML
    sess.sql("DELETE FROM top_orders WHERE o_custkey % 2 = 0")
    assert spark.table("top_orders").filter("o_custkey % 2 = 0").count() == 0
    # INSERT INTO must NOT be captured by the INTO route
    assert (
        sess.sql("SELECT count(*) AS n FROM orders").collect()[0].n > 0
    )


def test_array_literals_and_containment(spark):
    sess = _sess(spark)
    row = sess.sql(
        "SELECT ARRAY[1, 2, 3] AS a, ARRAY[ARRAY[1], ARRAY[2, 3]] AS nested"
    ).collect()[0]
    assert row.a == [1, 2, 3] and row.nested == [[1], [2, 3]]
    row = sess.sql(
        "SELECT ARRAY[1, 2, 3] @> ARRAY[2, 1] AS contains_yes, "
        "ARRAY[1, 2] @> ARRAY[9] AS contains_no, "
        "ARRAY[2] <@ ARRAY[1, 2, 3] AS within"
    ).collect()[0]
    assert (row.contains_yes, row.contains_no, row.within) == (
        True, False, True,
    )
    # overlap operator + literal protection
    row = sess.sql(
        "SELECT 'ARRAY[9]' AS s, "
        "ARRAY[1, 2] && ARRAY[2, 9] AS olap_yes, "
        "ARRAY[1] && ARRAY[5] AS olap_no"
    ).collect()[0]
    assert row.s == "ARRAY[9]"
    assert (row.olap_yes, row.olap_no) == (True, False)
