"""COPY .. FROM STDIN (plans/copy_stdin.py + session.copy_from_stdin)
↔ reference commands/multi_copy.c stdin path — the psql-dump replay
surface."""

import io

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import register_views

    s = register_views(spark, SF_SMALL)
    for t in ("st_t", "st_csv", "st_seq", "st_part", "st_p1", "st_p2"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    yield s


def test_heredoc_text_format(sess):
    """The exact shape pg_dump emits: tab-delimited, \\N nulls,
    backslash escapes, a \\. terminator."""
    sess.sql("CREATE TABLE st_t (id bigint, name text, score double precision)")
    out = sess.sql(
        "COPY st_t (id, name, score) FROM stdin;\n"
        "1\talpha\t1.5\n"
        "2\t\\N\t2.5\n"
        "3\ttab\\there\t\\N\n"
        "\\.\n"
    )
    assert out.collect()[0][0] == 3
    rows = sorted(
        tuple(r) for r in sess.sql("SELECT * FROM st_t").collect()
    )
    assert rows == [
        (1, "alpha", 1.5),
        (2, None, 2.5),
        (3, "tab\there", None),
    ]


def test_heredoc_csv_and_defaults(sess):
    sess.sql(
        "CREATE TABLE st_csv (id bigint, tag text DEFAULT 'seed', "
        "val double precision)"
    )
    out = sess.sql(
        "COPY st_csv (id, val) FROM STDIN WITH (FORMAT csv);\n"
        "1,1.25\n"
        "2,\n"
        "\\.\n"
    )
    assert out.collect()[0][0] == 2
    rows = sorted(
        tuple(r) for r in sess.sql("SELECT * FROM st_csv").collect()
    )
    # omitted column takes its DEFAULT; empty csv field is NULL
    assert rows == [(1, "seed", 1.25), (2, "seed", None)]


def test_api_form_and_identity_draw(sess):
    sess.sql(
        "CREATE TABLE st_seq (id bigserial, tag text)"
    )
    n = sess.copy_from_stdin(
        "st_seq", io.StringIO("a\nb\nc\n\\.\n"), cols=["tag"]
    ).collect()[0][0]
    assert n == 3
    rows = sess.sql("SELECT id, tag FROM st_seq ORDER BY id").collect()
    assert [r.tag for r in rows] == ["a", "b", "c"]
    assert sorted(r.id for r in rows) == [1, 2, 3]
    # iterable-of-lines source
    n = sess.copy_from_stdin("st_seq", ["d\n", "e\n"], cols=["tag"])
    assert n.collect()[0][0] == 2
    assert sess.sql("SELECT count(*) FROM st_seq").collect()[0][0] == 5


def test_copy_stdin_routes_partitions(sess):
    sess.sql("CREATE TABLE st_part (id int, t date) PARTITION BY RANGE (t)")
    sess.sql(
        "CREATE TABLE st_p1 PARTITION OF st_part "
        "FOR VALUES FROM ('2020-01-01') TO ('2021-01-01')"
    )
    sess.sql(
        "CREATE TABLE st_p2 PARTITION OF st_part "
        "FOR VALUES FROM ('2021-01-01') TO ('2022-01-01')"
    )
    sess.sql(
        "COPY st_part FROM stdin;\n"
        "1\t2020-05-05\n"
        "2\t2021-06-06\n"
        "\\.\n"
    )
    assert sess.sql("SELECT count(*) FROM st_p1").collect()[0][0] == 1
    assert sess.sql("SELECT count(*) FROM st_p2").collect()[0][0] == 1
    sess.sql("DROP TABLE st_part")


def test_malformed_input_rejects(sess):
    sess.sql("CREATE TABLE st_t (id bigint, name text)")
    # ragged row
    with pytest.raises(ValueError, match="fields"):
        sess.sql("COPY st_t FROM stdin;\n1\ta\tEXTRA\n\\.\n")
    # type coercion failure errors, never loads NULL silently
    with pytest.raises(ValueError, match="coerce"):
        sess.sql("COPY st_t FROM stdin;\nnot_a_number\ta\n\\.\n")
    # generated columns cannot be COPY targets
    sess.sql("DROP TABLE st_t")
    sess.sql(
        "CREATE TABLE st_t (id bigint, dbl bigint "
        "GENERATED ALWAYS AS (id * 2) STORED)"
    )
    with pytest.raises(ValueError, match="generated"):
        sess.sql("COPY st_t (id, dbl) FROM stdin;\n1\t2\n\\.\n")
    # bare COPY targets the non-generated columns; generated recompute
    sess.sql("COPY st_t FROM stdin;\n21\n\\.\n")
    assert sess.sql("SELECT dbl FROM st_t").collect()[0][0] == 42


def test_empty_line_is_a_row_not_skipped(sess):
    """PG text format: an empty data line is one empty-string field —
    a legal row for a single-column table (review fix: these were
    silently dropped)."""
    sess.sql("CREATE TABLE st_t (name text)")
    out = sess.sql(
        "COPY st_t (name) FROM STDIN;\n"
        "alpha\n"
        "\n"
        "beta\n"
        "\\.\n"
    )
    assert out.collect()[0][0] == 3
    rows = sorted(
        (r[0] or "") for r in sess.sql("SELECT * FROM st_t").collect()
    )
    assert rows == ["", "alpha", "beta"]


def test_empty_line_multi_column_errors(sess):
    """PG: 'missing data for column' on a blank line in a multi-column
    table — never a silent skip."""
    sess.sql("CREATE TABLE st_t (id bigint, name text)")
    with pytest.raises(Exception, match="missing|expected 2"):
        sess.sql(
            "COPY st_t (id, name) FROM STDIN;\n1\talpha\n\n\\.\n"
        )


def test_csv_quoted_empty_vs_unquoted(sess):
    """PG CSV: unquoted empty field is NULL, quoted empty ("") is the
    empty string (review fix: both decoded as NULL before)."""
    sess.sql("CREATE TABLE st_csv (id bigint, tag text)")
    out = sess.sql(
        'COPY st_csv (id, tag) FROM STDIN WITH (FORMAT csv);\n'
        '1,""\n'
        "2,\n"
        '3,"a,""b"\n'
        "\\.\n"
    )
    assert out.collect()[0][0] == 3
    rows = sorted(
        tuple(r) for r in sess.sql("SELECT * FROM st_csv").collect()
    )
    assert rows == [(1, ""), (2, None), (3, 'a,"b')]


def test_head_without_semicolon(sess):
    """PG accepts the COPY head terminated by a newline — the
    semicolon is only psql's send trigger (review fix)."""
    sess.sql("CREATE TABLE st_t (id bigint, name text)")
    out = sess.sql(
        "COPY st_t (id, name) FROM STDIN\n1\talpha\n2\tbeta\n\\.\n"
    )
    assert out.collect()[0][0] == 2


def test_api_trailing_newline_not_a_row(sess):
    """A str payload ending in a newline has a line TERMINATOR, not a
    trailing empty row; a doubled newline IS an empty row."""
    sess.sql("CREATE TABLE st_t (name text)")
    n = sess.copy_from_stdin("st_t", "a\nb\n", cols=["name"])
    assert n.collect()[0][0] == 2
    sess.sql("DROP TABLE st_t")
    sess.sql("CREATE TABLE st_t (name text)")
    n = sess.copy_from_stdin("st_t", "a\n\n", cols=["name"])
    assert n.collect()[0][0] == 2  # 'a' and one empty-string row


def test_csv_multiline_quoted_field(sess):
    """PG CSV accepts embedded newlines inside quoted fields (review
    fix: line-at-a-time split had dropped this)."""
    sess.sql("CREATE TABLE st_t (id bigint, body text)")
    out = sess.sql(
        "COPY st_t (id, body) FROM STDIN WITH (FORMAT csv);\n"
        '1,"line1\nline2"\n'
        "2,plain\n"
        "\\.\n"
    )
    assert out.collect()[0][0] == 2
    rows = dict(
        (r[0], r[1]) for r in sess.sql("SELECT * FROM st_t").collect()
    )
    assert rows == {1: "line1\nline2", 2: "plain"}


def test_head_newline_then_with_shaped_data(sess):
    """A first data line that reads 'WITH (..)' must stay DATA when
    the head ended at the newline (review fix)."""
    sess.sql("CREATE TABLE st_t (body text)")
    out = sess.sql(
        "COPY st_t (body) FROM STDIN\nWITH (FORMAT csv)\nplain\n\\.\n"
    )
    assert out.collect()[0][0] == 2
    got = sorted(r[0] for r in sess.sql("SELECT * FROM st_t").collect())
    assert got == ["WITH (FORMAT csv)", "plain"]
