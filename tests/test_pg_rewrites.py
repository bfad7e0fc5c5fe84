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
    # WITH TIES on a unique key degenerates to a plain LIMIT
    ties = pg_sess.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "FETCH FIRST 3 ROWS WITH TIES"
    ).collect()
    assert [r.o_orderkey for r in ties] == sorted(
        r.o_orderkey for r in ties
    ) and len(ties) == 3


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


def test_explain_option_list_plan_only(pg_sess):
    # PG regress form: EXPLAIN (COSTS OFF) — renders a plan, executes
    # nothing, and the inner statement passes through the PG rewrites
    out = pg_sess.sql(
        "EXPLAIN (COSTS OFF) SELECT DISTINCT ON (o_custkey) o_custkey "
        "FROM orders ORDER BY o_custkey"
    ).collect()
    assert len(out) == 1 and "Physical Plan" in out[0].plan
    verbose = pg_sess.sql(
        "EXPLAIN VERBOSE SELECT count(*) FROM orders"
    ).collect()
    assert "Physical Plan" in verbose[0].plan


def test_explain_analyze_option_executes(pg_sess):
    out = pg_sess.sql(
        "EXPLAIN (ANALYZE, COSTS OFF) SELECT count(*) AS c FROM orders"
    ).collect()
    assert len(out) == 1 and out[0].plan  # metric-annotated tree


def test_with_ties_boundary_group(spark, pg_sess):
    # first 2 rows by priority cut inside a tie group -> every peer of
    # the 2nd row's priority must come back
    rows = pg_sess.sql(
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "ORDER BY o_orderpriority FETCH FIRST 2 ROWS WITH TIES"
    ).collect()
    first_pri = spark.sql(
        "SELECT min(o_orderpriority) AS p FROM orders"
    ).collect()[0].p
    n_first = spark.sql(
        f"SELECT count(*) AS n FROM orders WHERE o_orderpriority = '{first_pri}'"
    ).collect()[0].n
    assert len(rows) == n_first
    assert {r.o_orderpriority for r in rows} == {first_pri}


def test_with_ties_alias_and_aggregate(pg_sess):
    # ORDER BY a select-list alias of an aggregate: the rewrite must
    # substitute the expression (a window spec can't see the alias)
    rows = pg_sess.sql(
        "SELECT o_orderpriority, count(*) AS cnt FROM orders "
        "GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority "
        "FETCH FIRST 2 ROWS WITH TIES"
    ).collect()
    assert len(rows) == 2
    assert rows[0].cnt >= rows[1].cnt


def test_with_ties_in_cte(pg_sess):
    n = pg_sess.sql(
        "WITH t AS (SELECT o_custkey FROM orders ORDER BY o_custkey "
        "FETCH FIRST 1 ROWS WITH TIES) SELECT count(*) AS n FROM t"
    ).collect()[0].n
    assert n >= 1


def test_with_ties_requires_order_by(pg_sess):
    with pytest.raises(Exception, match="ORDER BY"):
        pg_sess.sql(
            "SELECT o_orderkey FROM orders FETCH FIRST 2 ROWS WITH TIES"
        )


def test_for_update_strips_as_noop(spark, pg_sess):
    rows = pg_sess.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 100 "
        "ORDER BY o_orderkey FOR UPDATE SKIP LOCKED"
    ).collect()
    plain = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 100 "
        "ORDER BY o_orderkey"
    ).collect()
    assert [r.o_orderkey for r in rows] == [r.o_orderkey for r in plain]
    share = pg_sess.sql(
        "SELECT count(*) AS c FROM orders FOR NO KEY UPDATE OF orders NOWAIT"
    ).collect()
    assert share[0].c > 0


def test_pg_subscripts_one_based(pg_sess):
    pg_sess.pg_compat = True
    r = pg_sess.sql(
        "SELECT array(10, 20, 30, 40)[2] AS el, "
        "array(10, 20, 30, 40)[2:3] AS sl FROM orders LIMIT 1"
    ).collect()[0]
    # PG semantics: [2] is the SECOND element, [2:3] inclusive ends
    assert r.el == 20 and r.sl == [20, 30]
    # a literal containing brackets is never touched
    lit = pg_sess.sql("SELECT 'a[1]' AS s FROM orders LIMIT 1").collect()
    assert lit[0].s == "a[1]"


def test_pg_subscripts_gated_off_by_default(pg_sess):
    # without pg_compat, Spark's native 0-based subscript rules
    r = pg_sess.sql(
        "SELECT array(10, 20, 30)[1] AS el FROM orders LIMIT 1"
    ).collect()[0]
    assert r.el == 20  # Spark 0-based: index 1 = second element


def test_jsonpath_functions(pg_sess):
    rows = pg_sess.sql(
        "SELECT jsonb_path_query_first(props, '$.k') AS k FROM events "
        "WHERE jsonb_path_exists(props, '$.k') LIMIT 5"
    ).collect()
    assert rows and all(r.k is not None for r in rows)
    # @? operator spelling
    n = pg_sess.sql(
        "SELECT count(*) AS n FROM events WHERE props @? '$.k'"
    ).collect()[0].n
    assert n > 0


def test_jsonpath_filter_syntax_rejected(pg_sess):
    with pytest.raises(ValueError, match="filter/wildcard"):
        pg_sess.sql(
            "SELECT jsonb_path_exists(props, '$.k ? (@ > 1)') FROM events"
        )


def test_jsonpath_literal_in_first_arg(pg_sess):
    rows = pg_sess.sql(
        "SELECT jsonb_path_query_first(coalesce(props, '{}'), '$.k') AS k "
        "FROM events WHERE event_id < 100"
    ).collect()
    assert rows  # parses and runs; NULL k where absent is fine


def test_tsquery_cast_under_pg_compat(pg_sess):
    pg_sess.pg_compat = True
    n = pg_sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ 'hash'::tsquery"
    ).collect()[0].n
    assert n > 0


def test_ordered_agg_asc_desc(pg_sess):
    asc = pg_sess.sql(
        "SELECT string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)"
        " AS s FROM (SELECT DISTINCT o_orderpriority FROM orders) t"
    ).collect()[0].s
    parts = asc.split(",")
    assert parts == sorted(parts) and len(parts) == 5
    desc = pg_sess.sql(
        "SELECT string_agg(o_orderpriority, ',' ORDER BY o_orderpriority "
        "DESC) AS s FROM (SELECT DISTINCT o_orderpriority FROM orders) t"
    ).collect()[0].s
    assert desc.split(",") == list(reversed(parts))
    arr = pg_sess.sql(
        "SELECT array_agg(o_orderkey ORDER BY o_orderkey) AS a "
        "FROM orders WHERE o_orderkey < 40"
    ).collect()[0].a
    assert arr == sorted(arr)


def test_ordered_agg_rejections(pg_sess):
    with pytest.raises(ValueError, match="one sort key"):
        pg_sess.sql(
            "SELECT array_agg(o_orderkey ORDER BY o_custkey, o_orderkey) "
            "FROM orders"
        )
    # DISTINCT with a matching sort key is now supported (round 6);
    # a key that is NOT the aggregated expression still rejects (PG's
    # own rule)
    got = pg_sess.sql(
        "SELECT array_agg(DISTINCT o_orderstatus ORDER BY o_orderstatus) "
        "AS v FROM orders"
    ).collect()[0].v
    assert got == sorted(set(got))
    with pytest.raises(ValueError, match="DISTINCT"):
        pg_sess.sql(
            "SELECT array_agg(DISTINCT o_orderkey ORDER BY o_custkey) "
            "FROM orders"
        )


def test_array_length_rewrite(pg_sess):
    n = pg_sess.sql(
        "SELECT array_length(array(1, 2, 3), 1) AS n FROM orders LIMIT 1"
    ).collect()[0].n
    assert n == 3
    with pytest.raises(ValueError, match="dimension 1"):
        pg_sess.sql("SELECT array_length(arr, 2) FROM orders")


def test_prepared_null_parameter(pg_sess):
    # ↔ reference null_parameters.sql: typed NULL arguments must cast
    # through the PG→Spark type map (CAST(NULL AS text) is invalid)
    pg_sess.sql(
        "PREPARE np (text) AS SELECT count(*) AS n FROM orders "
        "WHERE o_orderpriority = $1 OR $1 IS NULL"
    )
    total = pg_sess.sql("SELECT count(*) AS n FROM orders").collect()[0].n
    assert pg_sess.sql("EXECUTE np (NULL)").collect()[0].n == total
    some = pg_sess.sql("EXECUTE np ('1-URGENT')").collect()[0].n
    assert 0 < some < total
    pg_sess.sql("DEALLOCATE np")


def test_prepared_digit_types_and_float(pg_sess):
    pg_sess.sql(
        "PREPARE dt (int4, float) AS SELECT count(*) AS n FROM orders "
        "WHERE o_custkey % 10 = $1 AND o_totalprice > $2"
    )
    assert pg_sess.sql("EXECUTE dt (3, 1000.0)").collect()[0].n > 0
    pg_sess.sql("DEALLOCATE dt")


def test_ordered_agg_delimiter_containing_order_by(pg_sess):
    s = pg_sess.sql(
        "SELECT string_agg(o_orderpriority, ' order by ' "
        "ORDER BY o_orderpriority) AS s "
        "FROM (SELECT DISTINCT o_orderpriority FROM orders) t"
    ).collect()[0].s
    parts = s.split(" order by ")
    assert parts == sorted(parts) and len(parts) == 5


def test_array_length_empty_is_null(pg_sess):
    r = pg_sess.sql(
        "SELECT array_length(filter(array(1), x -> x > 5), 1) AS n "
        "FROM orders LIMIT 1"
    ).collect()[0]
    assert r.n is None  # PG: empty array has no dimension 1


def test_pg_substring_regex_rewrite():
    from citus_spark.plans.rewrites import pg_substring_regex as f

    # positional forms pass through untouched
    assert f("SELECT substring(x FROM 3 FOR 5) FROM t") == \
        "SELECT substring(x FROM 3 FOR 5) FROM t"
    assert f("SELECT substring(x, 2) FROM t") == \
        "SELECT substring(x, 2) FROM t"
    # whole-match (no capture) → group 0
    out = f("SELECT substring(name FROM '[0-9]+') FROM t")
    assert "regexp_extract(name, '[0-9]+', 0)" in out and "RLIKE" in out
    # capturing pattern → group 1
    out = f("SELECT substring(name FROM 'id=([0-9]+)') FROM t")
    assert "regexp_extract(name, 'id=([0-9]+)', 1)" in out
    # a literal containing ' FROM ' never confuses the split
    out = f("SELECT substring(a || ' FROM b' FROM 'x(y)') FROM t")
    assert out.count("a || ' FROM b'") == 2
    # two calls in one statement both rewrite
    out = f("SELECT substring(a FROM 'x'), substring(b FROM 'y') FROM t")
    assert out.count("regexp_extract") == 2


def test_regexp_rewrites_backslash_literals(spark):
    """r7 review repros: Spark's literal parser eats backslashes, so
    re-emitted pattern/replacement literals must re-escape — silent
    wrong results otherwise."""
    from citus_spark.plans.rewrites import (
        pg_regexp_replace_flags,
        pg_substring_regex,
    )

    def run(sql):
        return spark.sql(
            pg_regexp_replace_flags(pg_substring_regex(sql))
        ).collect()[0][0]

    assert run(r"SELECT substring('abc123' FROM '\d+')") == "123"
    assert run(r"SELECT substring('42x' FROM '\(([0-9]+)\)')") is None
    assert run(r"SELECT substring('(42)x' FROM '\(([0-9]+)\)')") == "42"
    assert run(
        r"SELECT regexp_replace('a1b2', '(\d)', '[\1]', 'g')"
    ) == "a[1]b[2]"
    # literal dollar in the replacement (Java would read $5 as a group)
    assert run(
        r"SELECT regexp_replace('price 5', '5', 'costs $5', 'g')"
    ) == "price costs $5"
    # PG \\1 = literal backslash-1, \& = whole match
    assert run(r"SELECT regexp_replace('aa', '(a)', '\\1', 'g')") == \
        "\\1\\1"
    assert run(r"SELECT regexp_replace('abc', 'b+', '[\&]', 'g')") == \
        "a[b]c"
    # nested regex substring: both levels rewrite (expr duplicates)
    from citus_spark.plans.rewrites import pg_substring_regex as f

    out = f("SELECT substring(substring(x FROM '[a-z]+') FROM '[0-9]+')")
    assert out.count("regexp_extract") == 3
    # non-literal replacement with 'g' is rejected loudly
    import pytest

    with pytest.raises(ValueError, match="LITERAL replacement"):
        pg_regexp_replace_flags(
            "SELECT regexp_replace(s, '(a)', col || 'x', 'g') FROM t"
        )
    with pytest.raises(ValueError, match="not supported"):
        pg_regexp_replace_flags(
            "SELECT regexp_replace(s, 'a', 'b', 'x') FROM t"
        )


def test_regexp_replace_i_and_gi_flags(spark):
    """PG flag semantics: 'i' (and '') replace only the FIRST match;
    'gi' is global case-insensitive (r7 verdict missing-item #3)."""
    from citus_spark.plans.rewrites import pg_regexp_replace_flags

    def run(sql):
        return spark.sql(pg_regexp_replace_flags(sql)).collect()[0][0]

    # global case-insensitive
    assert run(
        "SELECT regexp_replace('Hello hello HELLO', 'hello', 'X', 'gi')"
    ) == "X X X"
    assert run(
        "SELECT regexp_replace('Hello hello HELLO', 'hello', 'X', 'ig')"
    ) == "X X X"
    # 'i': case-insensitive, FIRST match only
    assert run(
        "SELECT regexp_replace('Hello hello HELLO', 'hello', 'X', 'i')"
    ) == "X hello HELLO"
    # '': case-sensitive, first match only (PG's 4-arg default)
    assert run(
        "SELECT regexp_replace('aa bb aa', 'aa', 'X', '')"
    ) == "X bb aa"
    # backrefs shift correctly under the first-only wrap
    assert run(
        r"SELECT regexp_replace('a1b2', '([a-z])(\d)', '\2\1', 'i')"
    ) == "1ab2"
    # whole-match ref under the wrap
    assert run(
        r"SELECT regexp_replace('abc ABC', 'b', '[\&]', 'i')"
    ) == "a[b]c ABC"
    # pattern-internal backref renumbers under the wrap
    assert run(
        r"SELECT regexp_replace('xaax', '([a])\1', 'Y', 'i')"
    ) == "xYx"
    # no match: unchanged
    assert run(
        "SELECT regexp_replace('abc', 'zz', 'X', 'i')"
    ) == "abc"
    # 3-arg Spark-native signature passes through untouched
    assert run(
        "SELECT regexp_replace('aa', 'a', 'b')"
    ) == "bb"
    # unknown flags still reject loudly
    import pytest

    with pytest.raises(ValueError, match="flags"):
        pg_regexp_replace_flags(
            "SELECT regexp_replace('a', 'a', 'b', 'x')"
        )


def test_regexp_replace_g_flag_computed_pattern(spark):
    """Plain 'g' is exactly Spark's 3-arg semantics — a pattern from a
    column/expression passes through untouched (review fix: the flag
    work had started rejecting it)."""
    from citus_spark.plans.rewrites import pg_regexp_replace_flags

    sql = pg_regexp_replace_flags(
        "SELECT regexp_replace('aXbXc', p, '-', 'g') AS r "
        "FROM (SELECT 'X' AS p)"
    )
    assert "'g'" not in sql
    assert spark.sql(sql).collect()[0][0] == "a-b-c"
    # 'i'/first-match still need a literal pattern (they rewrite it)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="LITERAL pattern"):
        pg_regexp_replace_flags(
            "SELECT regexp_replace('aXb', p, '-', 'gi') FROM t"
        )


def test_plpgsql_return_query_non_leading_rejects():
    """RETURN QUERY anywhere but as the single body statement must
    reject loudly, not emit 'SELECT QUERY SELECT ..' (review fix)."""
    import pytest as _pytest

    from citus_spark.plans.plpgsql_sql import plpgsql_body_to_sql

    with _pytest.raises(NotImplementedError, match="RETURN QUERY"):
        plpgsql_body_to_sql(
            "DECLARE lim int := 3; BEGIN lim := lim + 1; "
            "RETURN QUERY SELECT 1 LIMIT lim; END"
        )


def test_pg_overlaps_semantics():
    """PG OVERLAPS: swapped endpoints normalize; equal starts always
    overlap (even zero-length); touching intervals do not."""
    from citus_spark.plans.rewrites import pg_overlaps

    out = pg_overlaps("SELECT (a, b) OVERLAPS (c, d)")
    assert "least(a, b)" in out and "greatest(c, d)" in out
    # literal containing the keyword is left alone
    assert pg_overlaps("SELECT 'x OVERLAPS y'") == "SELECT 'x OVERLAPS y'"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parenthesized"):
        pg_overlaps("SELECT a OVERLAPS b")


def test_pg_power_caret_shapes():
    from citus_spark.plans.rewrites import pg_power_caret

    assert pg_power_caret("SELECT 2 ^ 10") == "SELECT power(2, 10)"
    # left-associative like PG
    assert (
        pg_power_caret("SELECT a ^ b ^ c")
        == "SELECT power(power(a, b), c)"
    )
    assert pg_power_caret("SELECT (1+1) ^ f(x)") == (
        "SELECT power((1+1), f(x))"
    )
    # regex literals with ^ are masked
    assert pg_power_caret("SELECT '^ab'") == "SELECT '^ab'"


def test_pg_update_row_set_scoping():
    """Row-form SET expands pairwise; a row-VALUE comparison in the
    WHERE clause of the same statement stays untouched."""
    from citus_spark.plans.rewrites import pg_update_row_set

    out = pg_update_row_set(
        "UPDATE t SET (a, b) = (1, 'x') WHERE (c, d) = (2, 'y')"
    )
    assert "a = 1" in out and "b = 'x'" in out
    assert "(c, d) = (2, 'y')" in out
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="SELECT"):
        pg_update_row_set("UPDATE t SET (a, b) = (SELECT 1, 2)")


def test_pg_row_comparison_semantics(spark):
    from citus_spark.plans.rewrites import pg_row_comparison

    out = pg_row_comparison("SELECT (a, b) = (1, 'x')")
    assert "AND" in out and "=" in out
    # three-valued logic matches PG: NULL member -> NULL, unless
    # another member already decides false
    r = spark.sql(
        pg_row_comparison(
            "SELECT (1, NULL) = (1, 2) AS nullish, "
            "(1, NULL) = (2, 2) AS falsy, "
            "(1, 2) <> (1, 2) AS ne"
        )
    ).collect()[0]
    assert r.nullish is None and r.falsy is False and r.ne is False
    # lambda parameter tuples and IN lists never match
    lam = "SELECT aggregate(a, 0, (acc, x) -> acc + x)"
    assert pg_row_comparison(lam) == lam
    inq = "SELECT 1 WHERE (a, b) IN ((1, 2), (3, 4))"
    assert pg_row_comparison(inq) == inq


def test_pg_power_caret_precedence_and_chains(spark):
    """Review fixes: unary minus binds tighter than ^ (PG/DuckDB:
    -a ^ 2 = a²), binary minus looser; folded chains with call/paren
    operands keep folding; untranslatable residue raises instead of
    silently XOR-ing."""
    from citus_spark.plans.rewrites import pg_power_caret as f

    assert f("SELECT -a ^ 2") == "SELECT power(-a, 2)"
    assert f("SELECT b - a ^ 2") == "SELECT b - power(a, 2)"
    assert f("SELECT a ^ f(b) ^ c") == "SELECT power(power(a, f(b)), c)"
    assert (
        f("SELECT (1+1) ^ 2 ^ 2") == "SELECT power(power((1+1), 2), 2)"
    )
    assert spark.sql(f("SELECT -2 ^ 2 AS v")).collect()[0][0] == 4.0
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="power"):
        f("SELECT CASE WHEN x THEN 1 ELSE 2 END ^ 2")


def test_pg_array_compat_shapes():
    from citus_spark.plans.pgfmt_sql import pg_array_compat

    assert pg_array_compat("SELECT array_cat(a, b)") == "SELECT concat(a, b)"
    assert pg_array_compat("SELECT array_upper(xs, 1)") == "SELECT size(xs)"
    assert pg_array_compat("SELECT array_lower(xs, 1)") == "SELECT 1"
    assert (
        pg_array_compat("SELECT array_fill(0, array(5))")
        == "SELECT array_repeat(0, 5)"
    )
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="dimension 1"):
        pg_array_compat("SELECT array_upper(xs, 2)")


def test_pg_update_row_set_inside_expression_untouched():
    """A row-VALUE comparison nested inside a SET expression (CASE
    guard) is not an assignment — it must survive verbatim; only
    item-leading row forms expand (review fix)."""
    from citus_spark.plans.rewrites import pg_update_row_set

    sql = (
        "UPDATE t SET a = CASE WHEN (x, y) = (1, 2) THEN 3 ELSE 4 END "
        "WHERE id = 1"
    )
    assert pg_update_row_set(sql) == sql
    # mixed: a leading row-form item expands, the nested one stays
    out = pg_update_row_set(
        "UPDATE t SET (a, b) = (1, 2), "
        "c = CASE WHEN (x, y) = (8, 9) THEN 1 ELSE 0 END"
    )
    assert "a = 1" in out and "b = 2" in out
    assert "(x, y) = (8, 9)" in out
    # second item in the list also expands
    out2 = pg_update_row_set("UPDATE t SET z = 0, (a, b) = (1, 2)")
    assert "a = 1" in out2 and "b = 2" in out2


def test_pg_limit_null_and_offset_order_forms(spark):
    """regress multi_limit_clause.sql:226-242 — PG LIMIT NULL /
    OFFSET NULL / OFFSET-before-LIMIT spellings."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables("/root/testdata/sf0.001")
    assert len(s.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 9 "
        "ORDER BY o_orderkey LIMIT null"
    ).collect()) == len(s.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 9 "
        "ORDER BY o_orderkey"
    ).collect())
    rows = s.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 9 "
        "ORDER BY o_orderkey OFFSET 1 LIMIT 2"
    ).collect()
    assert len(rows) == 2
    assert len(s.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 9 "
        "ORDER BY o_orderkey OFFSET null LIMIT 1"
    ).collect()) == 1
    assert len(s.sql(
        "SELECT count(*) AS n FROM orders OFFSET 0 LIMIT null"
    ).collect()) == 1
    # the spellings inside string literals stay data
    assert s.sql("SELECT 'LIMIT NULL' AS s").collect()[0][0] == "LIMIT NULL"
