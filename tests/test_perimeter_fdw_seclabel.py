"""FDW / SECURITY LABEL / RULE / LISTEN-NOTIFY / parenthesized
VACUUM perimeter (r10 verdict items #4 and #7): every statement class
a PG 16 pg_dump or psql session emits must produce either a recorded
no-op or ONE named error — never a raw Spark ParseException.

Reference surface: commands/foreign_data_wrapper.c,
commands/foreign_server.c, commands/seclabel.c; regress
multi_create_fdw.sql, foreign_tables_mx.sql, seclabel.sql."""

import pytest

from citus_spark.session import DistributedSession

REGRESS = "/root/reference/src/test/regress/sql"


@pytest.fixture(scope="module")
def sess(spark):
    return DistributedSession(spark)


# --- named rejects ----------------------------------------------------

FDW_STATEMENTS = (
    "CREATE SERVER foreign_server FOREIGN DATA WRAPPER postgres_fdw "
    "OPTIONS (host 'localhost', port '5432', dbname 'other')",
    "ALTER SERVER foreign_server OPTIONS (SET port '5433')",
    "DROP SERVER IF EXISTS fake_fdw_server CASCADE",
    "CREATE FOREIGN DATA WRAPPER fake_fdw HANDLER fake_fdw_handler",
    "DROP FOREIGN DATA WRAPPER IF EXISTS fake_fdw CASCADE",
    "CREATE FOREIGN TABLE foreign_table (id integer NOT NULL, data text)"
    " SERVER foreign_server OPTIONS (schema_name 'public')",
    "ALTER FOREIGN TABLE foreign_table ADD COLUMN c int",
    "DROP FOREIGN TABLE foreign_table",
    "IMPORT FOREIGN SCHEMA public FROM SERVER foreign_server "
    "INTO local_schema",
    "CREATE USER MAPPING FOR CURRENT_USER SERVER foreign_server",
    "DROP USER MAPPING IF EXISTS FOR CURRENT_USER SERVER foreign_server",
)


@pytest.mark.parametrize("stmt", FDW_STATEMENTS)
def test_fdw_statements_raise_one_named_error(sess, stmt):
    with pytest.raises(
        NotImplementedError, match="foreign-data wrappers are not supported"
    ):
        sess.sql(stmt)


SECLABEL_STATEMENTS = (
    "SECURITY LABEL FOR \"citus '!tests_label_provider\" ON ROLE user1 "
    "IS 'citus_unclassified'",
    "SECURITY LABEL ON TABLE orders IS 'classified'",
    "SECURITY LABEL FOR anon ON COLUMN customer.c_name "
    "IS 'MASKED WITH FUNCTION anon.fake_name()'",
)


@pytest.mark.parametrize("stmt", SECLABEL_STATEMENTS)
def test_seclabel_statements_raise_one_named_error(sess, stmt):
    with pytest.raises(
        NotImplementedError, match="SECURITY LABEL is not supported"
    ):
        sess.sql(stmt)


def test_rule_ddl_raises_one_named_error(sess):
    for stmt in (
        "CREATE RULE notify_me AS ON UPDATE TO mytable DO ALSO "
        "NOTIFY mytable",
        "CREATE OR REPLACE RULE shoe_ins_protect AS ON INSERT TO shoe "
        "DO INSTEAD NOTHING",
        "DROP RULE IF EXISTS notify_me ON mytable",
    ):
        with pytest.raises(
            NotImplementedError, match="rewrite rules are not supported"
        ):
            sess.sql(stmt)


# --- recorded no-ops --------------------------------------------------

def test_listen_notify_are_recorded_noops(sess):
    for stmt, verb in (
        ("LISTEN virtual", "LISTEN"),
        ("NOTIFY virtual", "NOTIFY"),
        ("NOTIFY virtual, 'payload with '' quote'", "NOTIFY"),
        ("UNLISTEN virtual", "UNLISTEN"),
        ("UNLISTEN *", "UNLISTEN"),
    ):
        row = sess.sql(stmt).collect()[0][0]
        assert row.startswith(verb), (stmt, row)


def test_vacuum_parenthesized_options(sess):
    # go through the engine's own DDL so the catalog owns the table
    sess.sql("CREATE TABLE vac_paren_t (a int, b text)")
    sess.sql("INSERT INTO vac_paren_t VALUES (1, 'x'), (2, 'y')")
    # parenthesized VACUUM: compacts + analyzes, no ParseException
    out = sess.sql("VACUUM (ANALYZE) vac_paren_t").collect()
    assert out  # analyze stats rows
    out = sess.sql("VACUUM (FULL, ANALYZE) vac_paren_t").collect()
    assert out
    # word-option form
    sess.sql("VACUUM FULL vac_paren_t")
    # bare database-wide forms: recorded no-ops
    assert "no-op" in sess.sql("VACUUM").collect()[0][0]
    assert "no-op" in sess.sql("VACUUM (ANALYZE)").collect()[0][0]
    assert "no-op" in sess.sql("ANALYZE").collect()[0][0]
    # unknown option errors like PG, with a named message
    with pytest.raises(Exception, match="unrecognized VACUUM option"):
        sess.sql("VACUUM (TURBO) vac_paren_t")
    sess.sql("DROP TABLE vac_paren_t")


# --- regress-head replays --------------------------------------------

def test_multi_create_fdw_head_replays(sess):
    """Head of multi_create_fdw.sql: the SET/RESET scaffolding
    replays, and the FDW statements die with the named reject, not a
    ParseException."""
    text = open(f"{REGRESS}/multi_create_fdw.sql").read()
    head = text[: text.find("CREATE OR REPLACE FUNCTION")]
    stmts = [s.strip() for s in head.split(";") if s.strip()
             and not s.strip().startswith("--")]
    assert stmts
    for st in stmts:
        st_clean = "\n".join(
            ln for ln in st.splitlines()
            if not ln.strip().startswith("--")
        ).strip()
        if not st_clean:
            continue
        if "SERVER" in st_clean.upper() or "WRAPPER" in st_clean.upper():
            with pytest.raises(NotImplementedError, match="foreign-data"):
                sess.sql(st_clean)
        else:
            sess.sql(st_clean)  # SET/RESET scaffolding must replay


def test_seclabel_head_replays(sess):
    """Every SECURITY LABEL statement in seclabel.sql raises the one
    named reject — grep the real regress file so new spellings there
    keep being covered."""
    text = open(f"{REGRESS}/seclabel.sql").read()
    labels = [
        ln.strip().rstrip(";")
        for ln in text.splitlines()
        if ln.strip().upper().startswith("SECURITY LABEL")
    ]
    assert len(labels) >= 5
    for st in labels:
        with pytest.raises(
            NotImplementedError, match="SECURITY LABEL is not supported"
        ):
            sess.sql(st)


# --- admin no-ops + unsupported-object rejects (r11 wave 2) ----------

ADMIN_NOOPS = (
    "ALTER DEFAULT PRIVILEGES IN SCHEMA public GRANT SELECT ON TABLES "
    "TO r1",
    "DROP ROLE IF EXISTS some_role",
    "CREATE STATISTICS st_adm ON a, b FROM orders",
    "CREATE PUBLICATION pub_adm FOR TABLE orders",
    "ALTER PUBLICATION pub_adm ADD TABLE orders",
    "DROP PUBLICATION pub_adm",
    "CREATE EVENT TRIGGER et_adm ON ddl_command_start "
    "EXECUTE FUNCTION f()",
    "REASSIGN OWNED BY r1 TO r2",
    "DROP OWNED BY r1 CASCADE",
    "ALTER SYSTEM SET shared_buffers = '1GB'",
    "CHECKPOINT",
    "LOAD 'auto_explain'",
    "CREATE TEXT SEARCH CONFIGURATION tsc_adm (COPY = simple)",
    "CREATE TEXT SEARCH DICTIONARY tsd_adm (TEMPLATE = simple)",
)


@pytest.mark.parametrize("stmt", ADMIN_NOOPS)
def test_admin_statements_are_recorded_noops(sess, stmt):
    out = sess.sql(stmt).collect()[0][0]
    assert "no-op" in out, (stmt, out)


UNSUPPORTED_OBJECTS = (
    ("CREATE SUBSCRIPTION s1 CONNECTION 'x' PUBLICATION p1",
     "subscriptions are not supported"),
    ("CREATE ACCESS METHOD am1 TYPE TABLE HANDLER h1",
     "access methods are not supported"),
    ("CREATE CAST (int AS text) WITH INOUT",
     "custom casts are not supported"),
    ("CREATE OPERATOR === (LEFTARG = int, RIGHTARG = int, FUNCTION = f)",
     "operators are not supported"),
    ("CREATE OPERATOR CLASS oc1 FOR TYPE int USING btree AS OPERATOR 1 <",
     "operator classes"),
    ("CREATE TRANSFORM FOR int LANGUAGE sql (FROM SQL WITH FUNCTION f)",
     "TRANSFORM"),
)


@pytest.mark.parametrize("stmt,msg", UNSUPPORTED_OBJECTS)
def test_unsupported_object_classes_raise_named_errors(sess, stmt, msg):
    with pytest.raises(NotImplementedError, match=msg):
        sess.sql(stmt)


def test_replica_identity_and_cluster_on_are_noops(sess):
    sess.sql("CREATE TABLE adm_ri_t (a int)")
    sess.sql("ALTER TABLE adm_ri_t REPLICA IDENTITY FULL")
    sess.sql("ALTER TABLE adm_ri_t REPLICA IDENTITY NOTHING")
    sess.sql("ALTER TABLE adm_ri_t CLUSTER ON some_idx")
    sess.sql("ALTER TABLE adm_ri_t SET WITHOUT CLUSTER")
    sess.sql("DROP TABLE adm_ri_t")


def test_queries_with_cast_and_operator_words_not_hijacked(sess):
    assert sess.sql("SELECT CAST(1 AS INT) AS x").collect()[0][0] == 1
    assert sess.sql(
        "SELECT 1 AS v WHERE 'operator' = 'operator'"
    ).collect()[0][0] == 1


def test_alter_drop_variants_of_rejected_classes(sess):
    """Third review pass: ALTER/DROP variants of rejected CREATE
    classes must produce the same named error family, and an
    admin-head statement no classifier claims must never fall through
    to a raw ParseException."""
    with pytest.raises(NotImplementedError, match="subscriptions"):
        sess.sql("DROP SUBSCRIPTION s1")
    with pytest.raises(NotImplementedError, match="subscriptions"):
        sess.sql("ALTER SUBSCRIPTION s1 DISABLE")
    with pytest.raises(NotImplementedError, match="operators"):
        sess.sql("ALTER OPERATOR === (int, int) OWNER TO u")


def test_admin_noop_status_heads_are_clean(sess):
    assert sess.sql("DROP ROLE IF EXISTS nobody_x").collect()[0][0].startswith(
        "DROP ROLE"
    )
    out = sess.sql("LOAD 'auto_explain'").collect()[0][0]
    assert out.startswith("LOAD accepted"), out


def test_distinct_on_unprojected_base_column_order(spark):
    """Third review pass: ORDER BY on a base column that shares its
    name with an operand of an unaliased expression item must still
    travel as a hidden column (out_names tests the ITEM shape)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables("/root/testdata/sf0.001")
    rows = s.sql(
        "SELECT DISTINCT ON (o_custkey) o_custkey, "
        "o_totalprice - o_shippriority FROM "
        "(SELECT o_custkey, o_totalprice, "
        " CAST(o_orderkey % 3 AS DOUBLE) AS o_shippriority FROM orders) t "
        "ORDER BY o_custkey, o_shippriority DESC LIMIT 5"
    ).collect()
    assert len(rows) == 5
    # implicit alias still referenced by name in the outer ORDER BY
    rows2 = s.sql(
        "SELECT DISTINCT ON (o_custkey) o_custkey, count(*) n "
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey, n LIMIT 5"
    ).collect()
    assert len(rows2) == 5


def test_limit_forms_multiple_occurrences_and_literals(spark):
    """Third review pass: pg_limit_forms recomputes mask spans per
    pass — multiple rewrites with literals in between stay exact."""
    from citus_spark.plans.rewrites import pg_limit_forms as f

    out = f(
        "SELECT * FROM (SELECT a FROM t LIMIT NULL) x, "
        "(SELECT b FROM u LIMIT NULL) y WHERE s = 'OFFSET NULL'"
    )
    assert out.count("LIMIT ALL") == 2
    assert "'OFFSET NULL'" in out
    out2 = f(
        "SELECT * FROM (SELECT a FROM t LIMIT  NULL) x "
        "WHERE s='ab' OFFSET NULL"
    )
    assert out2.endswith("OFFSET 0")
    assert "'ab'" in out2
