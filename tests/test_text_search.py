"""PG full-text search surface (plans/textsearch_sql.py ↔ reference
text_search.sql regress). 'simple'-config semantics; execution is
pure JVM (SQL UDFs inside codegen)."""

import pytest

from citus_spark.plans.textsearch_sql import (
    _parse_tsquery,
    emit_match,
    pg_text_search,
)
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_tsquery_parser():
    assert _parse_tsquery("a") == ("term", "a")
    assert _parse_tsquery("A & B") == (
        "and", [("term", "a"), ("term", "b")]
    )
    t = _parse_tsquery("a & (b | !c)")
    assert t[0] == "and" and t[1][1][0] == "or"
    with pytest.raises(ValueError, match="unbalanced|unexpected"):
        _parse_tsquery("a & (b")


def test_emit_match_uses_set_helpers():
    sql = emit_match("v", ("and", [("term", "a"), ("term", "b")]))
    assert sql == "ts_match_all(v, array('a', 'b'))"
    sql = emit_match("v", ("or", [("term", "a"), ("term", "b")]))
    assert sql == "ts_match_any(v, array('a', 'b'))"


def test_match_and_rank_end_to_end(sess, spark):
    n = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector('english', text) @@ to_tsquery('hash & join')"
    ).collect()[0].n
    both = spark.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE text RLIKE '(?i)\\\\bhash\\\\b' AND text RLIKE '(?i)\\\\bjoin\\\\b'"
    ).collect()[0].n
    assert 0 < n <= both  # word-boundary regex is a superset (punct)
    r = sess.sql(
        "SELECT ts_rank(to_tsvector(text), to_tsquery('hash')) AS r "
        "FROM documents WHERE to_tsvector(text) @@ 'hash'::tsquery "
        "ORDER BY r DESC LIMIT 1"
    ).collect()[0].r
    assert 0 < r <= 1


def test_negation_and_or(sess):
    n_or = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('hash | join')"
    ).collect()[0].n
    n_and_not = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('hash & !join')"
    ).collect()[0].n
    n_and = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('hash & join')"
    ).collect()[0].n
    n_hash = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('hash')"
    ).collect()[0].n
    assert n_and + n_and_not == n_hash  # partition identity
    assert n_or >= n_hash >= n_and


def test_plainto_and_standalone_tsvector(sess):
    rows = sess.sql(
        "SELECT to_tsvector('Hello, World! 42') AS v FROM documents LIMIT 1"
    ).collect()
    assert rows[0].v == ["hello", "world", "42"]
    n = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ plainto_tsquery('hash join')"
    ).collect()[0].n
    n_and = sess.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector(text) @@ to_tsquery('hash & join')"
    ).collect()[0].n
    assert n == n_and  # plainto == implicit AND


def test_phrase_and_prefix_parser():
    t = _parse_tsquery("quick <-> brown")
    assert t[0] == "phrase" and [o for _n, o in t[1]] == [0, 1]
    t = _parse_tsquery("a <3> b <-> c")
    assert [o for _n, o in t[1]] == [0, 3, 4]
    assert _parse_tsquery("fox:*") == ("prefix", "fox")
    # phrase binds tighter than & (PG precedence)
    t = _parse_tsquery("a <-> b & c")
    assert t[0] == "and" and t[1][0][0] == "phrase"
    with pytest.raises(ValueError, match="weight labels"):
        _parse_tsquery("fox:A")
    with pytest.raises(ValueError, match="phrase members"):
        _parse_tsquery("(a & b) <-> c")


def test_phrase_prefix_end_to_end(sess, spark):
    spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "quick red fox jumps"),
         (3, "brown quick fox"), (4, "foxtrot quickstep")],
        "id int, body string",
    ).createOrReplaceTempView("ts_docs")

    def ids(q):
        return [
            r.id
            for r in sess.sql(
                "SELECT id FROM ts_docs WHERE to_tsvector(body) "
                f"@@ to_tsquery('{q}') ORDER BY id"
            ).collect()
        ]

    assert ids("quick <-> brown") == [1]
    assert ids("quick <2> fox") == [1, 2]
    assert ids("fox:*") == [1, 2, 3, 4]
    assert ids("quick:* <-> fox & brown") == [3]
    assert ids("!quick & fox:*") == [4]
    # empty-ish vector never matches a phrase (the CASE guard)
    spark.createDataFrame(
        [(9, "")], "id int, body string"
    ).createOrReplaceTempView("ts_docs")
    assert ids("a <-> b") == []
