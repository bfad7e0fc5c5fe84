"""to_char/to_date template translation, FROM-position unnest, and
ROW() constructors (plans/pgfmt_sql.py ↔ reference regress:
multi_behavioral_analytics_basics.sql, row_types.sql)."""

import pytest

from citus_spark.plans.pgfmt_sql import translate_datetime_format
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_template_translation():
    assert translate_datetime_format("YYYY-MM-DD") == "yyyy-MM-dd"
    assert translate_datetime_format("HH24:MI:SS.MS") == "HH:mm:ss.SSS"
    assert translate_datetime_format("FMMonth DD, YYYY") == "MMMM dd, yyyy"
    assert translate_datetime_format('"at" HH12 AM') == "'at' hh a"
    with pytest.raises(ValueError, match="numeric template"):
        translate_datetime_format("999.99")
    with pytest.raises(ValueError, match="no Spark pattern"):
        translate_datetime_format("J")


def test_to_char_end_to_end(sess, spark):
    rows = sess.sql(
        "SELECT to_char(o_orderdate, 'YYYY-MM') AS m, count(*) AS n "
        "FROM orders GROUP BY m ORDER BY m LIMIT 3"
    ).collect()
    import re

    assert rows and all(re.fullmatch(r"\d{4}-\d{2}", r.m) for r in rows)
    d = sess.sql(
        "SELECT to_date('02/01/2020', 'DD/MM/YYYY') AS d"
    ).collect()[0].d
    assert str(d) == "2020-01-02"


def test_unnest_from_position(sess):
    rows = sess.sql(
        "SELECT u FROM unnest(array(3, 1, 2)) AS t(u) ORDER BY u"
    ).collect()
    assert [r.u for r in rows] == [1, 2, 3]
    # bare alias names the column (PG scalar-function rule)
    rows = sess.sql(
        "SELECT w, count(*) AS n FROM documents, "
        "unnest(split(lower(text), '[^a-z]+')) AS w "
        "WHERE w IN ('hash', 'join') GROUP BY w ORDER BY w"
    ).collect()
    assert [r.w for r in rows] == ["hash", "join"] and all(
        r.n > 100 for r in rows
    )


def test_unnest_with_ordinality(sess):
    rows = sess.sql(
        "SELECT v, n FROM unnest(array('a','b','c')) "
        "WITH ORDINALITY AS t(v, n) ORDER BY n"
    ).collect()
    assert [(r.v, r.n) for r in rows] == [("a", 1), ("b", 2), ("c", 3)]


def test_unnest_multi_argument_zip(sess):
    """PG zip semantics: arrays walk in lock-step, the shorter
    NULL-pads (PG docs: multi-array unnest is FROM-only)."""
    rows = sess.sql(
        "SELECT a, b FROM unnest(array(1, 2, 3), array('x', 'y')) "
        "AS t(a, b) ORDER BY a"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y"), (3, None)]


def test_unnest_multi_argument_with_ordinality(sess):
    rows = sess.sql(
        "SELECT a, b, n FROM unnest(array(10, 20), array('p', 'q', 'r')) "
        "WITH ORDINALITY AS t(a, b, n) ORDER BY n"
    ).collect()
    assert [(r.a, r.b, r.n) for r in rows] == [
        (10, "p", 1), (20, "q", 2), (None, "r", 3),
    ]


def test_unnest_multi_argument_lateral_correlated(sess):
    """Correlated multi-arg unnest over table columns (the real
    usage: zip two parallel array columns per row)."""
    sess.spark.sql(
        "SELECT 1 AS k, array(1, 2) AS xs, array('a') AS ys"
    ).createOrReplaceTempView("zsrc")
    rows = sess.sql(
        "SELECT k, x, y FROM zsrc, unnest(xs, ys) AS t(x, y) ORDER BY x"
    ).collect()
    assert [(r.k, r.x, r.y) for r in rows] == [(1, 1, "a"), (1, 2, None)]


def test_unnest_multi_argument_bad_alias_count(sess):
    import pytest

    with pytest.raises(ValueError, match="alias names"):
        sess.sql(
            "SELECT * FROM unnest(array(1), array(2)) AS t(a, b, c)"
        )


def test_row_constructor_comparison(sess):
    r = sess.sql(
        "SELECT ROW(1, 2) < ROW(1, 3) AS lt, "
        "ROW(2, 0) > ROW(1, 9) AS gt, ROW(1, 2) = ROW(1, 2) AS eq"
    ).collect()[0]
    assert r.lt and r.gt and r.eq


def test_spark_native_formats_untouched(sess):
    # review finding: a format already in Spark's dialect must pass
    # through — the rewrite claims PG-exclusive fields only
    d = sess.sql("SELECT to_date('2020-01-02', 'yyyy-MM-dd') AS d").collect()
    assert str(d[0].d) == "2020-01-02"
    # ambiguous 'HH' alone stays Spark (24-hour), not translated
    t = sess.sql(
        "SELECT to_timestamp('2020-01-01 13', 'yyyy-MM-dd HH') AS t"
    ).collect()[0].t
    assert t.hour == 13


def test_to_char_quoted_text_escaping(sess):
    s = sess.sql(
        "SELECT to_char(o_orderdate, '\"at\" YYYY') AS s "
        "FROM orders LIMIT 1"
    ).collect()[0].s
    assert s.startswith("at 19") or s.startswith("at 20")


def test_subscript_with_function_index(sess):
    sess.pg_compat = True
    r = sess.sql(
        "SELECT array(10, 20, 30)[greatest(2, 1)] AS el FROM orders LIMIT 1"
    ).collect()[0]
    assert r.el == 20  # 1-based even with a comma-bearing index expr


def test_date_bin_semantics(sess):
    b = sess.sql(
        "SELECT date_bin(INTERVAL '15 minutes', "
        "TIMESTAMP '2020-01-01 10:23:45', TIMESTAMP '2020-01-01') AS b"
    ).collect()[0].b
    assert str(b) == "2020-01-01 10:15:00"
    # offset origin shifts the grid (the whole point of date_bin)
    b2 = sess.sql(
        "SELECT date_bin(INTERVAL '15 minutes', "
        "TIMESTAMP '2020-01-01 10:23:45', "
        "TIMESTAMP '2020-01-01 00:05:00') AS b"
    ).collect()[0].b
    assert str(b2) == "2020-01-01 10:20:00"
    with pytest.raises(ValueError, match="month"):
        sess.sql(
            "SELECT date_bin(INTERVAL '1 month', ts, "
            "TIMESTAMP '2020-01-01') FROM events"
        )


def test_between_symmetric(sess):
    n1 = sess.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey BETWEEN SYMMETRIC 200 AND 100"
    ).collect()[0].n
    n2 = sess.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey BETWEEN 100 AND 200"
    ).collect()[0].n
    assert n1 == n2 > 0


def test_date_bin_strict_strides(sess):
    for bad in ("1.5 hours", "-1 hour", "0.5 seconds", "1 hour 30"):
        with pytest.raises(ValueError):
            sess.sql(
                f"SELECT date_bin(INTERVAL '{bad}', ts, "
                "TIMESTAMP '2020-01-01') FROM events"
            )
    ok = sess.sql(
        "SELECT date_bin(INTERVAL '1 hour 30 minutes', "
        "TIMESTAMP '2020-01-01 02:20:00', TIMESTAMP '2020-01-01') AS b"
    ).collect()[0].b
    assert str(ok) == "2020-01-01 01:30:00"


def test_between_symmetric_multi_token_bounds(sess):
    n1 = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderdate "
        "BETWEEN SYMMETRIC DATE '1995-01-01' AND DATE '1992-01-01'"
    ).collect()[0].n
    n2 = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderdate "
        "BETWEEN DATE '1992-01-01' AND DATE '1995-01-01'"
    ).collect()[0].n
    assert n1 == n2 > 0
    # function-call bound with internal commas
    n3 = sess.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderkey "
        "BETWEEN SYMMETRIC greatest(200, 100) AND least(100, 50) "
        "AND o_orderkey > 0"
    ).collect()[0].n
    n4 = sess.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey BETWEEN 50 AND 200"
    ).collect()[0].n
    assert n3 == n4


# --- pg_split_to_table ------------------------------------------------------

def test_regexp_split_to_table_select_list(sess):
    rows = sess.sql(
        "SELECT regexp_split_to_table('a1b22c', '[0-9]+') AS p"
    ).collect()
    assert [r.p for r in rows] == ["a", "b", "c"]


def test_string_to_table_from_position_bare_alias(sess):
    # PG: bare alias on a scalar SRF names the column too
    rows = sess.sql(
        "SELECT w FROM string_to_table('x y z', ' ') AS w ORDER BY w"
    ).collect()
    assert [r.w for r in rows] == ["x", "y", "z"]


def test_string_to_table_escapes_regex_metachars(sess):
    rows = sess.sql(
        "SELECT p FROM string_to_table('a.b.c', '.') AS t(p) ORDER BY p"
    ).collect()
    assert [r.p for r in rows] == ["a", "b", "c"]
    rows = sess.sql(
        "SELECT p FROM string_to_table('a|b||c', '|') AS t(p) ORDER BY p"
    ).collect()
    # empty piece between the doubled separator is preserved (PG keeps it)
    assert [r.p for r in rows] == ["", "a", "b", "c"]


def test_string_to_table_rejects_runtime_separator(sess):
    import pytest as _pt

    with _pt.raises(Exception, match="literal separator"):
        sess.sql(
            "SELECT p FROM documents, "
            "string_to_table(text, lang) AS t(p) LIMIT 1"
        )


def test_regexp_split_correlated_from_table(sess):
    rows = sess.sql(
        "SELECT count(*) AS n FROM documents, "
        "regexp_split_to_table(text, ' +') AS t(tok) WHERE tok <> ''"
    ).collect()
    assert rows[0].n > 0


def test_string_to_table_backslash_separator(sess):
    rows = sess.sql(
        r"SELECT p FROM string_to_table('a\\b\\c', '\\') AS t(p) ORDER BY p"
    ).collect()
    assert [r.p for r in rows] == ["a", "b", "c"]
    # backslash-dot separator must not become match-any-char
    rows = sess.sql(
        r"SELECT p FROM string_to_table('a\\.b xyb', '\\.') AS t(p) "
        "ORDER BY p"
    ).collect()
    assert [r.p for r in rows] == ["a", "b xyb"]


def test_unnest_multi_argument_null_array_pads(sess):
    """Review finding: PG treats a NULL array as empty here — the
    other arguments still emit, NULL-padded; arrays_zip(NULL, ..)
    would silently drop the row."""
    sess.spark.sql(
        "SELECT 1 AS k, CAST(NULL AS array<int>) AS xs, "
        "array('p', 'q') AS ys"
    ).createOrReplaceTempView("znull")
    rows = sess.sql(
        "SELECT k, x, y FROM znull, unnest(xs, ys) AS t(x, y) ORDER BY y"
    ).collect()
    assert [(r.k, r.x, r.y) for r in rows] == [(1, None, "p"), (1, None, "q")]
    # both NULL → zero rows (PG)
    sess.spark.sql(
        "SELECT CAST(NULL AS array<int>) AS xs, "
        "CAST(NULL AS array<int>) AS ys"
    ).createOrReplaceTempView("zboth")
    assert sess.sql(
        "SELECT * FROM zboth, unnest(xs, ys) AS t(x, y)"
    ).count() == 0
