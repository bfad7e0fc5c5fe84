"""Regression tests for the round-10 ADVICE findings (all five):
trigger-function DROP fall-through, SET LOCAL search_path divergence,
stale schema-member after DROP TABLE, CREATE OR REPLACE TRIGGER, and
the bare char-type alias corruption."""

import pytest

from citus_spark.plans.rewrites import bare_char_cast_to_string, pg_casts
from citus_spark.session import DistributedSession


@pytest.fixture(scope="module")
def sess(spark):
    return DistributedSession(spark)


def test_drop_trigger_function_is_a_recorded_noop(sess):
    """ADVICE medium: CREATE FUNCTION .. RETURNS trigger is only
    recorded; a pg_restore --clean replay later drops it — the DROP
    must pop the record, not issue Spark DROP TEMPORARY FUNCTION."""
    sess.sql(
        "CREATE FUNCTION trgfn_adv() RETURNS trigger AS $$ BEGIN "
        "RETURN NEW; END; $$ LANGUAGE plpgsql"
    )
    assert ("", "trgfn_adv") in sess._triggers
    out = sess.sql("DROP FUNCTION trgfn_adv()").collect()[0][0]
    assert "trigger function" in out
    assert ("", "trgfn_adv") not in sess._triggers
    # qualified create, bare drop — still resolves to the record
    sess.sql(
        "CREATE FUNCTION public.trgfn_q() RETURNS trigger AS $$ BEGIN "
        "RETURN NEW; END; $$ LANGUAGE plpgsql"
    )
    sess.sql("DROP FUNCTION trgfn_q()")
    assert not any(k[1].endswith("trgfn_q") for k in sess._triggers)


def test_set_local_search_path_reaches_the_dedicated_handler(sess):
    """ADVICE low: SET LOCAL/SESSION search_path must update
    _search_path (not vanish into Spark runtime conf)."""
    sess.sql("CREATE SCHEMA IF NOT EXISTS adv_sch")
    sess.sql("SET LOCAL search_path TO adv_sch")
    assert sess._search_path == "adv_sch"
    sess.sql("SET SESSION search_path = adv_sch, public")
    assert sess._search_path == "adv_sch, public"
    sess.sql("RESET search_path")
    assert sess._search_path == '"$user", public'


def test_drop_table_discards_all_schema_member_records(sess):
    """ADVICE low: dropping a table after RESET search_path must not
    leave a stale (schema, name) member that misroutes a later
    qualified reference to a different relation."""
    sess.sql("CREATE SCHEMA IF NOT EXISTS adv_sch2")
    sess.sql("SET search_path TO adv_sch2")
    sess.sql("CREATE TABLE adv_member_t (a int)")
    assert ("adv_sch2", "adv_member_t") in sess._schema_members
    sess.sql("RESET search_path")
    sess.sql("DROP TABLE adv_member_t")
    assert ("adv_sch2", "adv_member_t") not in sess._schema_members
    # a later bare CREATE under the default path must NOT be reachable
    # as adv_sch2.adv_member_t
    sess.sql("CREATE TABLE adv_member_t (b text)")
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM adv_sch2.adv_member_t").collect()
    sess.sql("DROP TABLE adv_member_t")


def test_create_or_replace_trigger_replaces(sess):
    """ADVICE low: the PG14+ OR REPLACE spelling overwrites the
    record instead of raising 'already exists'."""
    sess.sql("CREATE TABLE adv_trg_t (a int)")
    sess.sql(
        "CREATE TRIGGER adv_tr AFTER INSERT ON adv_trg_t "
        "FOR EACH ROW EXECUTE FUNCTION f()"
    )
    # plain duplicate still errors
    with pytest.raises(ValueError, match="already exists"):
        sess.sql(
            "CREATE TRIGGER adv_tr AFTER INSERT ON adv_trg_t "
            "FOR EACH ROW EXECUTE FUNCTION f()"
        )
    # OR REPLACE overwrites
    out = sess.sql(
        "CREATE OR REPLACE TRIGGER adv_tr BEFORE UPDATE ON adv_trg_t "
        "FOR EACH ROW EXECUTE FUNCTION g()"
    ).collect()[0][0]
    assert "recorded" in out
    assert "BEFORE UPDATE" in sess._triggers[("adv_trg_t", "adv_tr")]
    sess.sql("DROP TABLE adv_trg_t")


def test_bare_char_type_only_rewrites_cast_targets():
    """ADVICE low: `AS VARCHAR)`/`AS char)` must map to STRING only
    inside CAST(...)/TRY_CAST(...) — an alias literally named char at
    the end of a parenthesized subquery keeps its name."""
    assert bare_char_cast_to_string(
        "SELECT CAST(x AS VARCHAR) FROM t"
    ) == "SELECT CAST(x AS STRING) FROM t"
    assert bare_char_cast_to_string(
        "SELECT TRY_CAST(x AS CHARACTER VARYING), CAST(y AS char) FROM t"
    ) == "SELECT TRY_CAST(x AS STRING), CAST(y AS STRING) FROM t"
    # alias named char/varchar: untouched
    assert bare_char_cast_to_string(
        "SELECT * FROM (SELECT x AS char) s"
    ) == "SELECT * FROM (SELECT x AS char) s"
    assert bare_char_cast_to_string(
        "SELECT (SELECT 1 AS varchar) AS v"
    ) == "SELECT (SELECT 1 AS varchar) AS v"
    # VARCHAR(10) untouched; full pg_casts path composes with ::
    assert bare_char_cast_to_string(
        "SELECT CAST(x AS VARCHAR(10)) FROM t"
    ) == "SELECT CAST(x AS VARCHAR(10)) FROM t"
    assert pg_casts("SELECT x::VARCHAR, (SELECT y AS char) FROM t") == (
        "SELECT CAST(x AS STRING), (SELECT y AS char) FROM t"
    )


def test_bare_char_cast_executes(sess):
    rows = sess.sql("SELECT CAST(42 AS VARCHAR) AS s").collect()
    assert rows[0][0] == "42"


# --- second-pass review findings on the r11 wave ---------------------

def test_bare_char_cast_with_literal_operand():
    """Review: a string-literal operand split the paren pairing when
    the scan was segment-scoped — CAST('abc' AS VARCHAR) silently
    kept the length-less type and Spark threw DATATYPE_MISSING_SIZE."""
    assert pg_casts("SELECT CAST('abc' AS VARCHAR)") == (
        "SELECT CAST('abc' AS STRING)"
    )
    assert bare_char_cast_to_string(
        "SELECT CAST(replace(x, '(', '') AS VARCHAR) FROM t"
    ) == "SELECT CAST(replace(x, '(', '') AS STRING) FROM t"
    # literal containing the keyword shape: untouched
    assert bare_char_cast_to_string(
        "SELECT '(cast(x as varchar)' AS s"
    ) == "SELECT '(cast(x as varchar)' AS s"


def test_vacuum_word_options_do_not_eat_table_prefixes(sess):
    """Review: FULL|FREEZE|... matched as a PREFIX of the table name
    (VACUUM FULL freezer parsed table 'r')."""
    sess.sql("CREATE TABLE freezer (a int)")
    sess.sql("INSERT INTO freezer VALUES (1)")
    sess.sql("VACUUM FULL freezer")  # must target 'freezer'
    out = sess.sql("VACUUM (ANALYZE) freezer").collect()
    assert out
    sess.sql("DROP TABLE freezer")


def test_vacuum_boolean_option_values(sess):
    """Review: VACUUM (ANALYZE FALSE) t must NOT analyze."""
    sess.sql("CREATE TABLE vac_bool_t (a int)")
    sess.sql("INSERT INTO vac_bool_t VALUES (1)")
    out = sess.sql("VACUUM (ANALYZE FALSE) vac_bool_t").collect()
    # plain VACUUM returns the compacted-file count, not analyze stats
    assert out[0].asDict().get("files") is not None
    sess.sql("DROP TABLE vac_bool_t")


def test_vacuum_quoted_identifier(sess):
    # pg_dump quotes identifiers; the VACUUM parser must accept the
    # quoted spelling (engine CREATE TABLE takes bare names — quoting
    # a lowercase name refers to the same relation, as in PG)
    sess.sql("CREATE TABLE vacquoted (a int)")
    sess.sql('VACUUM (FULL) "vacquoted"')
    out = sess.sql('VACUUM (ANALYZE) "vacquoted"').collect()
    assert out
    sess.sql("DROP TABLE vacquoted")


def test_vacuum_fixture_view_gets_named_error(sess, spark):
    """Review: a registered read-only view must produce the named
    not-owned error, not a false 'relation does not exist'."""
    from citus_spark.queries import load_views

    load_views(spark, "/root/testdata/sf0.001")
    with pytest.raises(NotImplementedError, match="not\\s+owned by"):
        sess.sql("VACUUM (FULL) orders")


def test_drop_trigger_function_ambiguous_raises(sess):
    sess.sql(
        "CREATE FUNCTION sch_a.trgdup() RETURNS trigger AS $$ BEGIN "
        "RETURN NEW; END; $$ LANGUAGE plpgsql"
    )
    sess.sql(
        "CREATE FUNCTION sch_b.trgdup() RETURNS trigger AS $$ BEGIN "
        "RETURN NEW; END; $$ LANGUAGE plpgsql"
    )
    with pytest.raises(ValueError, match="not unique"):
        sess.sql("DROP FUNCTION trgdup()")
    # both records survive the failed drop
    assert sum(1 for k in sess._triggers if k[1].endswith("trgdup")) == 2
    sess.sql("DROP FUNCTION sch_a.trgdup()")
    assert sum(1 for k in sess._triggers if k[1].endswith("trgdup")) == 1
