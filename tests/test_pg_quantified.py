"""PG surface wave (round 6): quantified comparisons (ANY/SOME/ALL
over arrays and subqueries), AT TIME ZONE, extract(epoch FROM ..),
num_nonnulls/num_nulls, string_to_array, and the DISTINCT + ORDER BY
aggregate form. Each spelling is invalid Spark SQL (probed), so the
rewrites are unconditional — except ANY/SOME over a bare identifier,
which Spark may own (the any()/some() boolean aggregates) and which
is therefore deliberately left alone."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def pg_sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


# ---------------------------------------------------------------- ANY / ALL
def test_eq_any_pg_array_literal(pg_sess):
    # ↔ reference regress multi_hash_pruning.sql:107
    rows = pg_sess.sql(
        "SELECT DISTINCT o_orderkey FROM orders "
        "WHERE o_orderkey = ANY ('{1,2,3}') ORDER BY o_orderkey"
    ).collect()
    assert [r.o_orderkey for r in rows] == [1, 2, 3]


def test_eq_any_cast_array_literal(pg_sess):
    rows = pg_sess.sql(
        "SELECT DISTINCT o_orderkey FROM orders "
        "WHERE o_orderkey = ANY ('{4,5}'::int[]) ORDER BY o_orderkey"
    ).collect()
    assert [r.o_orderkey for r in rows] == [4, 5]


def test_any_null_is_null(pg_sess):
    # ↔ multi_hash_pruning.sql:117 `WHERE l_orderkey = ANY (NULL)`
    rows = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_orderkey = ANY (NULL)"
    ).collect()
    assert rows[0].c == 0  # NULL predicate keeps nothing
    val = pg_sess.sql("SELECT (1 = ANY (NULL)) AS v").collect()[0].v
    assert val is None  # and the bare expression IS NULL, like PG


def test_gt_any_and_all_array_expr(pg_sess):
    r = pg_sess.sql(
        "SELECT (5 > ANY (array(1, 9))) AS a, "
        "(5 > ALL (array(1, 9))) AS b, "
        "(5 > ALL (array(1, 2))) AS c"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (True, False, True)


def test_any_three_valued_logic(pg_sess):
    # PG: no match + NULL element => NULL; match beats NULL
    r = pg_sess.sql(
        "SELECT (2 = ANY (array(1, CAST(NULL AS INT)))) AS a, "
        "(1 = ANY (array(1, CAST(NULL AS INT)))) AS b, "
        "(0 < ALL (array(1, CAST(NULL AS INT)))) AS c"
    ).collect()[0]
    assert r.a is None and r.b is True and r.c is None


def test_eq_any_subquery_becomes_in(pg_sess):
    rows = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey = ANY "
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()
    plain = pg_sess.spark.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()
    assert rows[0].c == plain[0].c > 0


def test_neq_all_subquery_becomes_not_in(pg_sess):
    got = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey <> ALL "
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()[0].c
    plain = pg_sess.spark.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()[0].c
    assert got == plain > 0


def test_gt_any_subquery_rejected(pg_sess):
    with pytest.raises(ValueError, match="ANY"):
        pg_sess.sql(
            "SELECT * FROM orders WHERE o_custkey > ANY "
            "(SELECT c_custkey FROM customer)"
        )


def test_bare_identifier_any_left_for_spark(pg_sess):
    # `= any(col)` over a boolean column is Spark's any() aggregate —
    # ownership is unprovable, so the text must reach Spark untouched
    got = pg_sess.sql(
        "SELECT (true = any(flag)) AS v FROM "
        "(SELECT o_orderkey > 2 AS flag FROM orders)"
    ).collect()[0].v
    assert got is True


def test_left_operand_call_and_paren(pg_sess):
    r = pg_sess.sql(
        "SELECT (abs(-2) = ANY ('{1,2}')) AS a, "
        "((1 + 1) = ANY ('{2}')) AS b"
    ).collect()[0]
    assert r.a is True and r.b is True


# ------------------------------------------------------------ AT TIME ZONE
def test_at_time_zone_naive_to_instant(pg_sess):
    # naive wall-clock in Denver (UTC-7 in January) -> UTC instant
    r = pg_sess.sql(
        "SELECT TIMESTAMP '2024-01-15 10:00:00' "
        "AT TIME ZONE 'America/Denver' AS v"
    ).collect()[0]
    assert str(r.v) == "2024-01-15 17:00:00"


def test_at_time_zone_chained_roundtrip(pg_sess):
    # naive -> instant -> wall-clock in another zone (PG chain
    # semantics: the second application inverts direction)
    r = pg_sess.sql(
        "SELECT TIMESTAMP '2024-01-15 10:00:00' "
        "AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS v"
    ).collect()[0]
    assert str(r.v) == "2024-01-15 05:00:00"


def test_at_time_zone_requires_literal_zone(pg_sess):
    with pytest.raises(ValueError, match="literal zone"):
        pg_sess.sql(
            "SELECT ts AT TIME ZONE some_col FROM events LIMIT 1"
        )


# --------------------------------------------------------- extract(epoch)
def test_extract_epoch_timestamp_and_date(pg_sess):
    r = pg_sess.sql(
        "SELECT extract(epoch FROM TIMESTAMP '1970-01-02 00:00:00.5') "
        "AS a, extract(epoch FROM DATE '1970-01-03') AS b"
    ).collect()[0]
    assert r.a == 86400.5  # fractional seconds preserved, like PG
    assert r.b == 172800.0


def test_extract_other_fields_untouched(pg_sess):
    r = pg_sess.sql(
        "SELECT extract(YEAR FROM DATE '2024-03-01') AS y"
    ).collect()[0]
    assert r.y == 2024


# ----------------------------------------------------- num_nonnulls/nulls
def test_num_nonnulls_and_nulls(pg_sess):
    r = pg_sess.sql(
        "SELECT num_nonnulls(1, NULL, 'x', NULL) AS a, "
        "num_nulls(1, NULL, 'x', NULL) AS b"
    ).collect()[0]
    assert (r.a, r.b) == (2, 2)


# --------------------------------------------------------- string_to_array
def test_string_to_array_semantics(pg_sess):
    r = pg_sess.sql(
        "SELECT string_to_array('a,b,,c', ',') AS a, "
        "string_to_array('', ',') AS b, "
        "string_to_array('x.y', '.') AS c"
    ).collect()[0]
    assert r.a == ["a", "b", "", "c"]  # empty fields kept, like PG
    assert r.b == []  # PG: empty input -> empty array
    assert r.c == ["x", "y"]  # '.' escaped, not regex-any


def test_string_to_array_inside_any(pg_sess):
    # ↔ reference multi_real_time_transaction.sql:323 idiom
    rows = pg_sess.sql(
        "SELECT DISTINCT o_orderkey FROM orders WHERE "
        "CAST(o_orderkey AS STRING) = ANY (string_to_array('7,8', ',')) "
        "ORDER BY o_orderkey"
    ).collect()
    assert [r.o_orderkey for r in rows] == [7, 8]


def test_string_to_array_runtime_sep_rejected(pg_sess):
    with pytest.raises(ValueError, match="literal separator"):
        pg_sess.sql(
            "SELECT string_to_array(o_comment, o_orderpriority) "
            "FROM orders"
        )


# ------------------------------------------- DISTINCT + ORDER BY aggregates
def test_array_agg_distinct_order_asc_desc(pg_sess):
    r = pg_sess.sql(
        "SELECT array_agg(DISTINCT v ORDER BY v) AS a, "
        "array_agg(DISTINCT v ORDER BY v DESC) AS d "
        "FROM VALUES (3), (1), (3), (NULL), (2) AS t(v)"
    ).collect()[0]
    assert r.a == [1, 2, 3, None]  # PG ASC: NULLS LAST, nulls kept
    assert r.d == [None, 3, 2, 1]  # PG DESC: NULLS FIRST


def test_string_agg_distinct_order(pg_sess):
    r = pg_sess.sql(
        "SELECT string_agg(DISTINCT s, ',' ORDER BY s) AS v "
        "FROM VALUES ('b'), ('a'), ('b') AS t(s)"
    ).collect()[0]
    assert r.v == "a,b"


def test_array_agg_distinct_key_mismatch_rejected(pg_sess):
    with pytest.raises(ValueError, match="DISTINCT"):
        pg_sess.sql(
            "SELECT array_agg(DISTINCT a ORDER BY b) "
            "FROM VALUES (1, 2) AS t(a, b)"
        )


# --------------------------------------------- review-pass regressions (r6)
def test_compound_left_operand_chain(pg_sess):
    # comparison binds looser than || and arithmetic: the WHOLE
    # concatenation/sum is the left operand
    r = pg_sess.sql(
        "SELECT (('a' || 'b') = ANY ('{ab,cd}')) AS a, "
        "('a' || 'b' = ANY ('{ab,cd}')) AS b, "
        "(1 + 1 = ANY ('{2}'::int[])) AS c, "
        "(-1 = ANY ('{-1}'::int[])) AS d"
    ).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (True, True, True, True)


def test_parenthesized_chain_direction(pg_sess):
    # the wrapped inner conversion must still flip direction
    r = pg_sess.sql(
        "SELECT (TIMESTAMP '2024-01-15 10:00:00' AT TIME ZONE 'UTC') "
        "AT TIME ZONE 'America/New_York' AS v"
    ).collect()[0]
    assert str(r.v) == "2024-01-15 05:00:00"


def test_nested_quantifier_in_subquery(pg_sess):
    n = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey = ANY "
        "(SELECT c_custkey FROM customer "
        " WHERE c_nationkey = ANY ('{1,2}'::int[]))"
    ).collect()[0].c
    plain = pg_sess.spark.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_nationkey IN (1, 2))"
    ).collect()[0].c
    assert n == plain > 0


def test_spark_any_aggregate_over_expression(pg_sess):
    # `= any(<boolean expr>)` is Spark's aggregate — must stay untouched
    got = pg_sess.sql(
        "SELECT (true = any(o_orderkey > 2)) AS v FROM orders"
    ).collect()[0].v
    assert got is True


def test_array_literal_null_element(pg_sess):
    # unquoted NULL in PG array-input syntax is the SQL NULL value:
    # the string 'NULL' must NOT match, and non-matches propagate NULL
    r = pg_sess.sql(
        "SELECT ('NULL' = ANY ('{foo,NULL}'::text[])) AS a, "
        "('foo' = ANY ('{foo,NULL}'::text[])) AS b"
    ).collect()[0]
    assert r.a is None and r.b is True


def test_array_literal_unknown_type_rejected(pg_sess):
    with pytest.raises(ValueError, match="element type"):
        pg_sess.sql("SELECT 1 = ANY ('{1}'::oid[])")


def test_string_to_array_empty_separator(pg_sess):
    # PG: empty delimiter -> the whole string is one field
    r = pg_sess.sql(
        "SELECT string_to_array('abc', '') AS a, "
        "string_to_array('', '') AS b"
    ).collect()[0]
    assert r.a == ["abc"] and r.b == []


def test_string_to_table_empty_separator(pg_sess):
    rows = pg_sess.sql(
        "SELECT * FROM string_to_table('abc', '') AS t(v)"
    ).collect()
    assert [r.v for r in rows] == ["abc"]


def test_case_operand_rejected_loudly(pg_sess):
    # a CASE expression as the quantified left operand cannot be
    # claimed textually — must raise, never silently truncate
    with pytest.raises(ValueError, match="left operand"):
        pg_sess.sql(
            "SELECT CASE WHEN o_orderkey > 2 THEN 1 ELSE 0 END "
            "= ANY ('{1}'::int[]) FROM orders"
        )


# ------------------------------------------ second review-pass regressions
def test_no_space_before_operator_subquery(pg_sess):
    n = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey=ANY"
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()[0].c
    m = pg_sess.sql(
        "SELECT count(*) AS c FROM orders WHERE o_custkey<>ALL"
        "(SELECT c_custkey FROM customer WHERE c_custkey < 10)"
    ).collect()[0].c
    total = pg_sess.sql("SELECT count(*) AS c FROM orders").collect()[0].c
    assert n > 0 and m > 0 and n + m == total


def test_wrapped_chain_direction(pg_sess):
    # a function wrapped around the inner conversion preserves the
    # instant; the outer AT TIME ZONE must convert back (from-UTC)
    r = pg_sess.sql(
        "SELECT date_trunc('hour', TIMESTAMP '2024-01-15 10:30:00' "
        "AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS v"
    ).collect()[0]
    assert str(r.v) == "2024-01-15 05:00:00"


def test_mixed_direction_operand_rejected(pg_sess):
    with pytest.raises(ValueError, match="zone state"):
        pg_sess.sql(
            "SELECT greatest(to_utc_timestamp(ts, 'UTC'), "
            "from_utc_timestamp(ts, 'UTC')) AT TIME ZONE 'UTC' "
            "FROM events"
        )


def test_pg_compat_any_array_cast(spark):
    # under pg_compat (the ported-PG-queries mode) the '{..}'::int[]
    # idiom must survive — pg_quantified claims it before pg_casts
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    s.sql("SET citus.pg_compat = on")
    try:
        rows = s.sql(
            "SELECT DISTINCT o_orderkey FROM orders "
            "WHERE o_orderkey = ANY ('{4,5}'::int[]) ORDER BY o_orderkey"
        ).collect()
        assert [r.o_orderkey for r in rows] == [4, 5]
    finally:
        s.sql("SET citus.pg_compat = off")


def test_nested_comparison_in_array_arg_claimed(pg_sess):
    # a comparison at depth > 0 is array-building detail, not a
    # boolean argument — the quantifier must still be claimed
    r = pg_sess.sql(
        "SELECT (5 > ANY (array_remove(array(1, 9), "
        "CASE WHEN 1 > 0 THEN 9 END))) AS v"
    ).collect()[0]
    assert r.v is True


def test_string_to_table_empty_input_zero_rows(pg_sess):
    rows = pg_sess.sql(
        "SELECT * FROM string_to_table('', ',') AS t(v)"
    ).collect()
    assert rows == []
    rows2 = pg_sess.sql(
        "SELECT * FROM string_to_table('', '') AS t(v)"
    ).collect()
    assert rows2 == []


def test_extract_epoch_nested_in_other_extract(pg_sess):
    r = pg_sess.sql(
        "SELECT extract(YEAR FROM to_timestamp(extract(epoch FROM "
        "TIMESTAMP '2024-03-01 00:00:00'))) AS y"
    ).collect()[0]
    assert r.y == 2024


def test_extract_epoch_timestamp_difference(pg_sess):
    # PG's duration idiom: epoch of a timestamp subtraction
    r = pg_sess.sql(
        "SELECT extract(epoch FROM TIMESTAMP '2024-01-02 00:00:30' "
        "- TIMESTAMP '2024-01-01 00:00:00') AS v"
    ).collect()[0]
    assert r.v == 86430.0


def test_extract_epoch_minus_interval_still_timestamp(pg_sess):
    r = pg_sess.sql(
        "SELECT extract(epoch FROM TIMESTAMP '1970-01-02 00:00:00' "
        "- INTERVAL 1 HOUR) AS v"
    ).collect()[0]
    assert r.v == 82800.0


def test_nested_string_to_array_in_src(pg_sess):
    r = pg_sess.sql(
        "SELECT string_to_array(array_to_string("
        "string_to_array('a,b', ','), ' '), ' ') AS v"
    ).collect()[0]
    assert r.v == ["a", "b"]


def test_distinct_key_literal_case_sensitive(pg_sess):
    # 'A'||x vs 'a'||x are DIFFERENT expressions (literals are values)
    with pytest.raises(ValueError, match="DISTINCT"):
        pg_sess.sql(
            "SELECT array_agg(DISTINCT 'A' || s ORDER BY 'a' || s) "
            "FROM VALUES ('x') AS t(s)"
        )
