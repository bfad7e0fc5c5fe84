"""Sequences + serial/IDENTITY columns (plans/sequence_sql.py,
operators/sequence.py ↔ reference sequences.sql /
multi_sequence_default.sql / generated_identity.sql regress).
Statement-level block allocation: ids are unique and contiguous per
statement; row→value pairing follows partition order (the reference
guarantees uniqueness only)."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_create_nextval_currval_setval(sess):
    sess.sql("CREATE SEQUENCE s1")
    assert sess.sql("SELECT nextval('s1') AS v").collect()[0].v == 1
    assert sess.sql("SELECT nextval('s1') AS v").collect()[0].v == 2
    assert sess.sql("SELECT currval('s1') AS v").collect()[0].v == 2
    assert sess.sql("SELECT setval('s1', 100) AS v").collect()[0].v == 100
    assert sess.sql("SELECT nextval('s1') AS v").collect()[0].v == 101
    sess.sql("DROP SEQUENCE s1")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("SELECT nextval('s1') AS v")


def test_sequence_start_increment_restart(sess):
    sess.sql("CREATE SEQUENCE s2 START WITH 10 INCREMENT BY 5")
    vals = [sess.sql("SELECT nextval('s2') AS v").collect()[0].v
            for _ in range(3)]
    assert vals == [10, 15, 20]
    sess.sql("ALTER SEQUENCE s2 RESTART WITH 2")
    assert sess.sql("SELECT nextval('s2') AS v").collect()[0].v == 2


def test_currval_before_nextval_errors(sess):
    sess.sql("CREATE SEQUENCE s3")
    with pytest.raises(ValueError, match="not yet defined"):
        sess.sql("SELECT currval('s3') AS v")


def test_multirow_values_draw_distinct(sess):
    sess.sql("CREATE SEQUENCE s4")
    sess.sql("CREATE TABLE seq_t (id bigint, v text)")
    sess.sql(
        "INSERT INTO seq_t VALUES (nextval('s4'), 'a'), "
        "(nextval('s4'), 'b'), (nextval('s4'), 'c')"
    )
    ids = sorted(r.id for r in sess.sql("SELECT id FROM seq_t").collect())
    assert ids == [1, 2, 3]


def test_nextval_over_from_block_allocation(sess):
    sess.sql("CREATE SEQUENCE s5 START WITH 100")
    rows = sess.sql(
        "SELECT nextval('s5') AS id, o_orderkey FROM orders "
        "WHERE o_orderkey < 200"
    ).collect()
    n = len(rows)
    assert n > 1
    assert sorted(r.id for r in rows) == list(range(100, 100 + n))
    # the sequence advanced by exactly n
    assert sess.sql("SELECT nextval('s5') AS v").collect()[0].v == 100 + n


def test_identity_column_fill(sess):
    sess.sql(
        "CREATE TABLE ident_t (id bigint GENERATED ALWAYS AS IDENTITY, "
        "name text)"
    )
    sess.sql("INSERT INTO ident_t (name) VALUES ('x'), ('y'), ('z')")
    sess.sql("INSERT INTO ident_t (name) VALUES ('w')")
    rows = sess.sql("SELECT id, name FROM ident_t").collect()
    assert sorted(r.id for r in rows) == [1, 2, 3, 4]
    assert {r.name for r in rows} == {"x", "y", "z", "w"}


def test_serial_column_fill_from_select(sess):
    sess.sql("CREATE TABLE ser_t (id serial, ok bigint)")
    sess.sql(
        "INSERT INTO ser_t (ok) SELECT o_orderkey FROM orders "
        "WHERE o_orderkey < 100"
    )
    rows = sess.sql("SELECT id, ok FROM ser_t").collect()
    assert sorted(r.id for r in rows) == list(range(1, len(rows) + 1))
    assert len({r.ok for r in rows}) == len(rows)


def test_nextval_in_update_per_row(sess):
    """PG assigns a DISTINCT value per affected row — distributed
    block allocation, one reservation for the whole statement."""
    sess.sql("CREATE SEQUENCE s9")
    sess.sql("CREATE TABLE up_t (k int, tag text)")
    sess.sql(
        "INSERT INTO up_t VALUES (0, 'a'), (0, 'b'), (0, 'c'), (0, 'd')"
    )
    sess.sql("UPDATE up_t SET k = nextval('s9') WHERE tag <> 'd'")
    rows = sess.sql("SELECT k, tag FROM up_t").collect()
    drawn = sorted(r.k for r in rows if r.tag != "d")
    assert drawn == [1, 2, 3]          # distinct, exactly 3 reserved
    assert [r.k for r in rows if r.tag == "d"] == [0]  # untouched
    # the sequence advanced by exactly the affected count
    assert sess.sql("SELECT nextval('s9') AS v").collect()[0].v == 4


def test_nextval_in_update_arithmetic_and_simultaneous(sess):
    """Arithmetic around the call works, and other assignments keep
    simultaneous semantics over OLD values."""
    sess.sql("CREATE SEQUENCE s10 START WITH 5")
    sess.sql("CREATE TABLE up2_t (k bigint, v bigint)")
    sess.sql("INSERT INTO up2_t VALUES (0, 10), (0, 20)")
    sess.sql("UPDATE up2_t SET k = nextval('s10') * 100 + v, v = v + 1")
    rows = sess.sql("SELECT k, v FROM up2_t ORDER BY v").collect()
    assert sorted(r.v for r in rows) == [11, 21]
    # k was computed from OLD v (simultaneous assignment)
    ks = sorted(r.k for r in rows)
    assert ks in ([510, 620], [520, 610])


def test_nextval_in_delete_rejected(sess):
    sess.sql("CREATE SEQUENCE s11")
    sess.sql("CREATE TABLE del_t (k int)")
    sess.sql("INSERT INTO del_t VALUES (1)")
    with pytest.raises(NotImplementedError, match="DELETE"):
        sess.sql("DELETE FROM del_t WHERE k = nextval('s11')")


def test_owned_sequence_drops_with_table(sess):
    sess.sql("CREATE TABLE own_t (id serial, v text)")
    sess.sql("INSERT INTO own_t (v) VALUES ('a'), ('b')")
    sess.sql("DROP TABLE own_t")
    sess.sql("CREATE TABLE own_t (id serial, v text)")
    sess.sql("INSERT INTO own_t (v) VALUES ('c')")
    ids = [r.id for r in sess.sql("SELECT id FROM own_t").collect()]
    assert ids == [1]  # numbering restarted (PG ownership semantics)


def test_identity_start_with_increment(sess):
    sess.sql(
        "CREATE TABLE idopt_t (id bigint GENERATED ALWAYS AS IDENTITY "
        "(START WITH 100 INCREMENT BY 10), v text)"
    )
    sess.sql("INSERT INTO idopt_t (v) VALUES ('x'), ('y'), ('z')")
    ids = sorted(r.id for r in sess.sql("SELECT id FROM idopt_t").collect())
    assert ids == [100, 110, 120]


def test_nextval_in_where_and_from_rejected(sess):
    """Review finding: nextval outside SET expressions must reject
    with a real message, not an unresolved-function crash."""
    sess.sql("CREATE SEQUENCE s12")
    sess.sql("CREATE TABLE uw_t (k int, v int)")
    sess.sql("INSERT INTO uw_t VALUES (1, 1)")
    with pytest.raises(NotImplementedError, match="WHERE clause"):
        sess.sql("UPDATE uw_t SET v = 1 WHERE k = nextval('s12')")
    sess.sql("CREATE TABLE uw_src (k int)")
    sess.sql("INSERT INTO uw_src VALUES (1)")
    with pytest.raises(NotImplementedError, match="UPDATE .. FROM"):
        sess.sql(
            "UPDATE uw_t SET v = nextval('s12') FROM uw_src "
            "WHERE uw_t.k = uw_src.k"
        )


def test_sequence_full_options(sess):
    """INCREMENT BY / MINVALUE / MAXVALUE / CYCLE / CACHE — the full
    PG option grammar (previously only START/INCREMENT parsed)."""
    sess.sql(
        "CREATE SEQUENCE opt_s INCREMENT BY 2 MINVALUE 10 MAXVALUE 16 "
        "START WITH 10 CACHE 20 NO CYCLE"
    )
    vals = [
        sess.sql("SELECT nextval('opt_s') AS v").collect()[0].v
        for _ in range(4)
    ]
    assert vals == [10, 12, 14, 16]
    with pytest.raises(ValueError, match="maximum value"):
        sess.sql("SELECT nextval('opt_s')")
    # CYCLE restarts at MINVALUE
    sess.sql("ALTER SEQUENCE opt_s CYCLE")
    assert sess.sql("SELECT nextval('opt_s') AS v").collect()[0].v == 10
    sess.sql("DROP SEQUENCE opt_s")


def test_sequence_descending_and_restart(sess):
    # descending default MAXVALUE is -1, so START 3 needs an explicit
    # bound (PG rejects it otherwise — probed)
    sess.sql(
        "CREATE SEQUENCE down_s INCREMENT BY -1 MAXVALUE 3 START WITH 3"
    )
    vals = [
        sess.sql("SELECT nextval('down_s') AS v").collect()[0].v
        for _ in range(4)
    ]
    assert vals == [3, 2, 1, 0]
    # descending default MINVALUE is huge-negative; tighten and exhaust
    sess.sql("ALTER SEQUENCE down_s MINVALUE -1")
    assert sess.sql("SELECT nextval('down_s') AS v").collect()[0].v == -1
    with pytest.raises(ValueError, match="minimum value"):
        sess.sql("SELECT nextval('down_s')")
    # ALTER START WITH changes what a bare RESTART returns to,
    # without moving the live counter (PG semantics)
    sess.sql("ALTER SEQUENCE down_s START WITH 2 RESTART")
    assert sess.sql("SELECT nextval('down_s') AS v").collect()[0].v == 2
    sess.sql("DROP SEQUENCE down_s")


def test_sequence_setval_bounds_and_block_guard(sess):
    sess.sql("CREATE SEQUENCE b_s MAXVALUE 5")
    with pytest.raises(ValueError, match="out of bounds"):
        sess.sql("SELECT setval('b_s', 99)")
    # a multi-row statement whose block would cross MAXVALUE fails
    # whole-statement (never fabricates values past the bound)
    sess.sql("CREATE TABLE bs_t (k bigint)")
    with pytest.raises(ValueError, match="maximum value"):
        sess.sql(
            "INSERT INTO bs_t SELECT nextval('b_s') FROM "
            "(SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3 "
            "UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6)"
        )
    sess.sql("DROP SEQUENCE b_s")


def test_sequence_unknown_option_rejected(sess):
    with pytest.raises(NotImplementedError, match="unsupported option"):
        sess.sql("CREATE SEQUENCE bad_s FROBNICATE 7")


def test_alter_sequence_atomic_and_restart_bounds(sess):
    """Review findings: a rejected ALTER leaves the sequence untouched
    (PG atomicity), and RESTART WITH is bounds-checked at ALTER time."""
    sess.sql("CREATE SEQUENCE at_s START WITH 100")
    with pytest.raises(ValueError, match="MINVALUE"):
        sess.sql("ALTER SEQUENCE at_s MINVALUE 10 MAXVALUE 5")
    # the failed ALTER wrote nothing — nextval still runs from 100
    assert sess.sql("SELECT nextval('at_s') AS v").collect()[0].v == 100
    sess.sql("ALTER SEQUENCE at_s MAXVALUE 200 CYCLE")
    with pytest.raises(ValueError, match="RESTART value"):
        sess.sql("ALTER SEQUENCE at_s RESTART WITH 999")
    # RESTART without WITH (PG grammar: WITH is optional)
    sess.sql("ALTER SEQUENCE at_s RESTART 150")
    assert sess.sql("SELECT nextval('at_s') AS v").collect()[0].v == 150
    sess.sql("DROP SEQUENCE at_s")


def test_sequence_as_type_bounds(sess):
    """AS smallint sets the value range from the type (PG: the
    sequence data type bounds MIN/MAXVALUE)."""
    sess.sql("CREATE SEQUENCE sm_s AS smallint")
    with pytest.raises(ValueError, match="out of bounds"):
        sess.sql("SELECT setval('sm_s', 40000)")
    sess.sql("SELECT setval('sm_s', 32766)")
    assert sess.sql("SELECT nextval('sm_s') AS v").collect()[0].v == 32767
    with pytest.raises(ValueError, match="maximum value"):
        sess.sql("SELECT nextval('sm_s')")
    sess.sql("DROP SEQUENCE sm_s")


def test_identity_options_honored(sess):
    """Review finding: MIN/MAXVALUE/CYCLE inside GENERATED .. AS
    IDENTITY (...) were silently dropped; owned sequences now build
    through the same option grammar as CREATE SEQUENCE."""
    sess.sql(
        "CREATE TABLE idopt_t (id int GENERATED ALWAYS AS IDENTITY "
        "(START WITH 5 MAXVALUE 7), v text)"
    )
    sess.sql("INSERT INTO idopt_t (v) VALUES ('a'), ('b'), ('c')")
    ids = sorted(
        r.id for r in sess.sql("SELECT id FROM idopt_t").collect()
    )
    assert ids == [5, 6, 7]
    with pytest.raises(ValueError, match="maximum value"):
        sess.sql("INSERT INTO idopt_t (v) VALUES ('d')")
    # serial columns carry their type's bounds (bigserial != serial)
    sess.sql("CREATE TABLE ser_b (id serial, v int)")
    st = sess._sequences["ser_b_id_seq"]
    assert st["max"] == 2**31 - 1 and st["min"] == 1
    sess.sql("DROP TABLE idopt_t")
    sess.sql("DROP TABLE ser_b")
