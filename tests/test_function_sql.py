"""CREATE FUNCTION .. LANGUAGE sql → Spark SQL UDFs
(plans/function_sql.py ↔ reference multi_sql_function.sql /
distributed_functions.sql)."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_scalar_expression_function(sess):
    sess.sql(
        "CREATE OR REPLACE FUNCTION tax(amount double precision) "
        "RETURNS double precision AS $$ SELECT amount * 0.08 $$ "
        "LANGUAGE sql IMMUTABLE"
    )
    r = sess.sql("SELECT tax(100.0) AS t").collect()[0]
    assert abs(r.t - 8.0) < 1e-12
    # usable inside a real query over data
    n = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE tax(o_totalprice) > 10000"
    ).collect()[0].n
    assert n > 0
    sess.sql("DROP FUNCTION tax(double precision)")


def test_query_body_becomes_scalar_subquery(sess):
    sess.sql(
        "CREATE FUNCTION orders_below(k bigint) RETURNS bigint "
        "LANGUAGE sql AS $$ SELECT count(*) FROM orders "
        "WHERE o_orderkey < k $$"
    )
    got = sess.sql("SELECT orders_below(100) AS n").collect()[0].n
    want = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderkey < 100"
    ).collect()[0].n
    assert got == want
    sess.sql("DROP FUNCTION IF EXISTS orders_below")


def test_single_quoted_body_and_dollar_tag(sess):
    sess.sql(
        "CREATE FUNCTION double_it(x int) RETURNS int AS "
        "'SELECT x * 2' LANGUAGE sql"
    )
    assert sess.sql("SELECT double_it(21) AS v").collect()[0].v == 42
    sess.sql(
        "CREATE FUNCTION halve_it(x int) RETURNS int AS "
        "$fn$ SELECT CAST(x / 2 AS INT) $fn$ LANGUAGE sql"
    )
    assert sess.sql("SELECT halve_it(10) AS v").collect()[0].v == 5


def test_create_distributed_function_noop(sess):
    sess.sql(
        "CREATE FUNCTION sq(x int) RETURNS int AS $$ SELECT x*x $$ "
        "LANGUAGE sql"
    )
    out = sess.sql(
        "SELECT create_distributed_function('sq(int)')"
    ).collect()[0][0]
    assert "distributed" in out
    assert sess.sql("SELECT sq(7) AS v").collect()[0].v == 49


def test_rejections(sess):
    # the plpgsql tutorial subset now translates (r8) — constructs
    # beyond it keep the loud reject (see
    # test_plpgsql_rejects_beyond_subset)
    sess.sql(
        "CREATE OR REPLACE FUNCTION f1() RETURNS int AS $$ BEGIN "
        "RETURN 1; END $$ LANGUAGE plpgsql"
    )
    assert sess.sql("SELECT f1()").collect()[0][0] == 1
    # unnamed-parameter positional form now works (see below);
    # OUT params stay rejected
    with pytest.raises(NotImplementedError, match="parameter"):
        sess.sql(
            "CREATE FUNCTION f3(OUT r int) RETURNS int AS "
            "$$ SELECT 1 $$ LANGUAGE sql"
        )


def test_copy_to_stdout_returns_relation(sess):
    rows = sess.sql(
        "COPY (SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority) TO STDOUT"
    ).collect()
    assert len(rows) == 5
    # STDIN without inline data still rejects, pointing at the
    # supported forms (the inline/here-doc form works — r8,
    # tests/test_copy_stdin.py)
    with pytest.raises(ValueError, match="inline data"):
        sess.sql("COPY orders FROM STDIN WITH (FORMAT csv)")


def test_table_function_and_setof(sess):
    sess.sql(
        "CREATE FUNCTION top_orders(k bigint) RETURNS TABLE("
        "okey bigint, price double precision) AS $$ "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < k $$ LANGUAGE sql"
    )
    rows = sess.sql(
        "SELECT count(*) AS n FROM top_orders(100)"
    ).collect()
    want = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderkey < 100"
    ).collect()[0].n
    assert rows[0].n == want
    # SETOF names its single column after the function (PG rule)
    sess.sql(
        "CREATE FUNCTION small_keys() RETURNS SETOF bigint AS $$ "
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 40 $$ "
        "LANGUAGE sql"
    )
    rows = sess.sql(
        "SELECT small_keys FROM small_keys() ORDER BY small_keys"
    ).collect()
    assert rows and all(r.small_keys < 40 for r in rows)


def test_positional_parameters_named(sess):
    """$N references resolve to the declared parameters (PG style)."""
    sess.sql(
        "CREATE FUNCTION addmul(a double precision, b double precision) "
        "RETURNS double precision AS $$ SELECT $1 * 10 + $2 $$ "
        "LANGUAGE sql"
    )
    r = sess.sql("SELECT addmul(3.0, 4.0) AS v").collect()[0]
    assert r.v == 34.0
    sess.sql("DROP FUNCTION addmul")


def test_positional_parameters_unnamed(sess):
    """Fully unnamed parameters (`f(int, text)`) — the only way to
    reference them is $N."""
    sess.sql(
        "CREATE FUNCTION rep(text, int) RETURNS text "
        "AS $$ SELECT repeat($1, $2) $$ LANGUAGE sql"
    )
    r = sess.sql("SELECT rep('ab', 3) AS v").collect()[0]
    assert r.v == "ababab"
    sess.sql("DROP FUNCTION rep")


def test_positional_out_of_range_rejected(sess):
    with pytest.raises(ValueError, match="references parameter"):
        sess.sql(
            "CREATE FUNCTION bad(a int) RETURNS int "
            "AS $$ SELECT $2 $$ LANGUAGE sql"
        )


def test_positional_inside_literal_untouched(sess):
    """'$1' inside a string literal is data, not a parameter ref."""
    sess.sql(
        "CREATE FUNCTION lit1(a text) RETURNS text "
        "AS $$ SELECT concat(a, '$1') $$ LANGUAGE sql"
    )
    assert sess.sql("SELECT lit1('x') AS v").collect()[0].v == "x$1"
    sess.sql("DROP FUNCTION lit1")


def test_parameter_defaults(sess):
    """PG DEFAULT parameters — both spellings — pass through to the
    Spark SQL UDF's native DEFAULT."""
    sess.sql(
        "CREATE FUNCTION padded(x int, pad int DEFAULT 10) RETURNS int "
        "AS $$ SELECT x + pad $$ LANGUAGE sql"
    )
    assert sess.sql("SELECT padded(1) AS v").collect()[0].v == 11
    assert sess.sql("SELECT padded(1, 2) AS v").collect()[0].v == 3
    sess.sql(
        "CREATE FUNCTION scaled(x double precision, k double precision = 2.0) "
        "RETURNS double precision AS $$ SELECT x * k $$ LANGUAGE sql"
    )
    assert sess.sql("SELECT scaled(3.0) AS v").collect()[0].v == 6.0
    sess.sql("DROP FUNCTION padded")
    sess.sql("DROP FUNCTION scaled")


def test_plpgsql_tutorial_subset(sess):
    """LANGUAGE plpgsql tutorial functions (r8; plans/plpgsql_sql.py)
    — the PG docs ch. 43 shapes pasted verbatim."""
    s = spark = sess
    s.sql(
        "CREATE OR REPLACE FUNCTION pl_increment(i integer) "
        "RETURNS integer AS $$\nBEGIN\n  RETURN i + 1;\nEND;\n$$ "
        "LANGUAGE plpgsql;"
    )
    assert spark.sql("SELECT pl_increment(41)").collect()[0][0] == 42

    s.sql(
        "CREATE OR REPLACE FUNCTION pl_sales_tax(subtotal real) "
        "RETURNS real AS $$\nBEGIN\n    RETURN subtotal * 0.06;\nEND;\n"
        "$$ LANGUAGE plpgsql;"
    )
    assert spark.sql("SELECT pl_sales_tax(100.0)").collect()[0][
        0
    ] == pytest.approx(6.0)

    # DECLARE with initializer + assignment + comment
    s.sql(
        """CREATE OR REPLACE FUNCTION pl_area(w double precision,
        h double precision) RETURNS double precision AS $$
        DECLARE
            scale double precision := 2.0;  -- doubled
            a double precision;
        BEGIN
            a := w * h;
            RETURN a * scale;
        END;
        $$ LANGUAGE plpgsql;"""
    )
    assert spark.sql("SELECT pl_area(3.0, 4.0)").collect()[0][0] == 24.0

    # IF / ELSIF / ELSE with RETURN branches
    s.sql(
        """CREATE OR REPLACE FUNCTION pl_grade(score int)
        RETURNS text AS $$
        BEGIN
            IF score >= 90 THEN
                RETURN 'A';
            ELSIF score >= 80 THEN
                RETURN 'B';
            ELSE
                RETURN 'C';
            END IF;
        END;
        $$ LANGUAGE plpgsql;"""
    )
    rows = spark.sql(
        "SELECT pl_grade(95), pl_grade(85), pl_grade(42)"
    ).collect()[0]
    assert tuple(rows) == ("A", "B", "C")

    # IF without ELSE falls through to the following RETURN
    s.sql(
        """CREATE OR REPLACE FUNCTION pl_clamp(x int) RETURNS int AS $$
        BEGIN
            IF x > 100 THEN
                RETURN 100;
            END IF;
            RETURN x;
        END;
        $$ LANGUAGE plpgsql;"""
    )
    got = spark.sql("SELECT pl_clamp(150), pl_clamp(7)").collect()[0]
    assert tuple(got) == (100, 7)

    # SELECT INTO over a relation (correlated scalar subquery)
    s.sql(
        """CREATE OR REPLACE FUNCTION pl_order_total(key bigint)
        RETURNS double precision AS $$
        DECLARE
            total double precision;
        BEGIN
            SELECT max(o_totalprice) INTO total
            FROM orders WHERE o_orderkey = key;
            RETURN total;
        END;
        $$ LANGUAGE plpgsql;"""
    )
    expected = spark.sql(
        "SELECT max(o_totalprice) FROM orders WHERE o_orderkey = 1"
    ).collect()[0][0]
    assert spark.sql("SELECT pl_order_total(1)").collect()[0][
        0
    ] == expected

    # RETURN QUERY → table function
    s.sql(
        """CREATE OR REPLACE FUNCTION pl_top_orders(lim int)
        RETURNS TABLE(okey bigint, price double precision) AS $$
        BEGIN
            RETURN QUERY SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3;
        END;
        $$ LANGUAGE plpgsql;"""
    )
    assert len(spark.sql("SELECT * FROM pl_top_orders(3)").collect()) == 3


def test_plpgsql_rejects_beyond_subset(spark):
    from citus_spark.plans.function_sql import parse_create_function

    with pytest.raises(NotImplementedError, match="unsupported statement"):
        parse_create_function(
            "CREATE FUNCTION f(i int) RETURNS int AS $$ BEGIN "
            "FOR j IN 1..10 LOOP RETURN j; END LOOP; END; $$ "
            "LANGUAGE plpgsql;"
        )
    with pytest.raises(NotImplementedError, match="volatile"):
        parse_create_function(
            "CREATE FUNCTION f() RETURNS int AS $$ DECLARE "
            "v int := nextval('s'); BEGIN RETURN v; END; $$ "
            "LANGUAGE plpgsql;"
        )
    with pytest.raises(NotImplementedError, match="not supported"):
        parse_create_function(
            "CREATE FUNCTION f() RETURNS int AS $$ return 1 $$ "
            "LANGUAGE plpython3u;"
        )


def test_plpgsql_for_loop_translations():
    """FOR r IN SELECT .. LOOP RETURN NEXT .. maps to one relational
    SELECT; guards become WHERE; row constructors unpack to columns;
    unsupported loop bodies reject loudly."""
    import pytest as _pytest

    from citus_spark.plans.plpgsql_sql import plpgsql_body_to_sql as f

    assert f(
        "BEGIN FOR r IN SELECT x, y FROM t LOOP "
        "RETURN NEXT r.x * 2; END LOOP; RETURN; END"
    ) == "SELECT x * 2 FROM (SELECT x, y FROM t) __for_row"
    assert f(
        "DECLARE r RECORD; BEGIN FOR r IN SELECT x FROM t LOOP "
        "IF r.x > 3 THEN RETURN NEXT r.x; END IF; END LOOP; END"
    ) == "SELECT x FROM (SELECT x FROM t) __for_row WHERE x > 3"
    assert f(
        "BEGIN FOR r IN SELECT x FROM t LOOP "
        "RETURN NEXT (r.x, r.x + 1); END LOOP; END"
    ) == "SELECT x, x + 1 FROM (SELECT x FROM t) __for_row"
    with _pytest.raises(NotImplementedError, match="FOR loop"):
        f(
            "BEGIN FOR r IN SELECT x FROM t LOOP "
            "UPDATE t SET x = 1; END LOOP; END"
        )
    with _pytest.raises(NotImplementedError, match="volatile"):
        f(
            "BEGIN FOR r IN SELECT nextval('s') AS x FROM t LOOP "
            "RETURN NEXT r.x; END LOOP; END"
        )


def test_plpgsql_loop_var_literals_untouched():
    """A literal containing 'r.' is data, not a loop-variable
    reference (review fix)."""
    from citus_spark.plans.plpgsql_sql import plpgsql_body_to_sql as f

    out = f(
        "BEGIN FOR r IN SELECT x FROM t LOOP "
        "RETURN NEXT concat('r.', r.x); END LOOP; END"
    )
    assert "concat('r.', x)" in out
