"""PG type-system DDL: CREATE TYPE (enum/composite), CREATE DOMAIN,
CREATE PROCEDURE / CALL — behaviors from the reference regress heads
distributed_types.sql:11-71, distributed_domain.sql:9-54,
sql_procedure.sql:19-40."""

import pytest

from citus_spark.session import DistributedSession


@pytest.fixture()
def sess(spark):
    return DistributedSession(spark)


def test_composite_type_roundtrip(sess):
    """distributed_types.sql:11-19: composite column, row-value cast,
    rename propagation, field access."""
    sess.sql("DROP TABLE IF EXISTS ty_t1")
    sess.sql("DROP TYPE IF EXISTS ty_tc1")
    sess.sql("DROP TYPE IF EXISTS ty_tc1_newname")
    sess.sql("CREATE TYPE ty_tc1 AS (a int, b varchar(20))")
    sess.sql("CREATE TABLE ty_t1 (a int PRIMARY KEY, b ty_tc1)")
    sess.sql("INSERT INTO ty_t1 VALUES (1, (2,'3')::ty_tc1)")
    r = sess.sql(
        "SELECT a, (b).a AS ba, (b).b AS bb FROM ty_t1"
    ).collect()
    assert [tuple(x) for x in r] == [(1, 2, "3")]
    sess.sql("ALTER TYPE ty_tc1 RENAME TO ty_tc1_newname")
    sess.sql("INSERT INTO ty_t1 VALUES (3, (4,'5')::ty_tc1_newname)")
    r = sess.sql(
        "SELECT a, b.a AS ba FROM ty_t1 ORDER BY a"
    ).collect()
    assert [tuple(x) for x in r] == [(1, 2), (3, 4)]
    # arity mismatch fails loudly
    with pytest.raises(ValueError, match="composite"):
        sess.sql("INSERT INTO ty_t1 VALUES (9, (1,2,3)::ty_tc1_newname)")


def test_enum_type_full_lifecycle(sess):
    """distributed_types.sql:25-41: enum column + CHECK, RENAME TO,
    ADD VALUE, declaration-order comparisons, SET SCHEMA cast."""
    sess.sql("DROP TABLE IF EXISTS ty_t2")
    for t in ("ty_te1", "ty_te1_newname"):
        sess.sql(f"DROP TYPE IF EXISTS {t}")
    sess.sql("CREATE TYPE ty_te1 AS ENUM ('one', 'two', 'three')")
    sess.sql("CREATE TABLE ty_t2 (a int PRIMARY KEY, b ty_te1)")
    sess.sql("INSERT INTO ty_t2 VALUES (1, 'two')")
    sess.sql("ALTER TYPE ty_te1 RENAME TO ty_te1_newname")
    sess.sql("ALTER TYPE ty_te1_newname ADD VALUE 'four'")
    sess.sql("UPDATE ty_t2 SET b = 'four'")
    sess.sql("INSERT INTO ty_t2 VALUES (3, 'three'::ty_te1_newname)")
    sess.sql("INSERT INTO ty_t2 VALUES (4, 'one')")
    # declaration order, not lexical: one < three < four
    r = sess.sql("SELECT a FROM ty_t2 ORDER BY b").collect()
    assert [x.a for x in r] == [4, 3, 1]
    assert [
        x.a for x in sess.sql(
            "SELECT a FROM ty_t2 WHERE b > 'three' ORDER BY a"
        ).collect()
    ] == [1]
    mn, mx = sess.sql(
        "SELECT min(b) AS mn, max(b) AS mx FROM ty_t2"
    ).collect()[0]
    assert (mn, mx) == ("one", "four")
    # label outside the set → CHECK violation
    with pytest.raises(ValueError, match="check constraint"):
        sess.sql("INSERT INTO ty_t2 VALUES (9, 'nope')")
    # invalid cast label errors at rewrite time
    with pytest.raises(ValueError, match="invalid input value"):
        sess.sql("INSERT INTO ty_t2 VALUES (9, 'nope'::ty_te1_newname)")


def test_enum_add_value_before_and_rename_value(sess):
    sess.sql("DROP TABLE IF EXISTS ty_t3")
    sess.sql("DROP TYPE IF EXISTS ty_sz")
    sess.sql("CREATE TYPE ty_sz AS ENUM ('small', 'large')")
    sess.sql("ALTER TYPE ty_sz ADD VALUE 'medium' BEFORE 'large'")
    sess.sql("ALTER TYPE ty_sz ADD VALUE IF NOT EXISTS 'medium'")
    sess.sql("CREATE TABLE ty_t3 (a int, sz ty_sz)")
    sess.sql(
        "INSERT INTO ty_t3 VALUES (1,'small'), (2,'medium'), (3,'large')"
    )
    assert [
        x.a for x in sess.sql(
            "SELECT a FROM ty_t3 ORDER BY sz DESC"
        ).collect()
    ] == [3, 2, 1]
    # RENAME VALUE rewrites stored rows (PG stores oids; we must
    # rewrite the label text)
    sess.sql("ALTER TYPE ty_sz RENAME VALUE 'medium' TO 'mid'")
    assert sess.sql(
        "SELECT sz FROM ty_t3 WHERE a = 2"
    ).collect()[0][0] == "mid"
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("ALTER TYPE ty_sz RENAME VALUE 'medium' TO 'x'")


def test_enum_set_schema_qualified_cast(sess):
    sess.sql("DROP TABLE IF EXISTS ty_t4")
    sess.sql("DROP TYPE IF EXISTS ty_mood")
    sess.sql("CREATE SCHEMA IF NOT EXISTS ty_schema2")
    sess.sql("CREATE TYPE ty_mood AS ENUM ('sad', 'ok', 'happy')")
    sess.sql("CREATE TABLE ty_t4 (a int, m ty_mood)")
    sess.sql("ALTER TYPE ty_mood SET SCHEMA ty_schema2")
    sess.sql("INSERT INTO ty_t4 VALUES (1, 'ok'::ty_schema2.ty_mood)")
    assert sess.sql("SELECT m FROM ty_t4").collect()[0][0] == "ok"


def test_create_type_rejects_unsupported(sess):
    with pytest.raises(NotImplementedError, match="RANGE"):
        sess.sql("CREATE TYPE ty_r AS RANGE (subtype = int)")
    with pytest.raises(NotImplementedError, match="shell"):
        sess.sql("CREATE TYPE ty_shell")
    sess.sql("DROP TYPE IF EXISTS ty_dup")
    sess.sql("CREATE TYPE ty_dup AS ENUM ('x')")
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("CREATE TYPE ty_dup AS ENUM ('y')")
    with pytest.raises(NotImplementedError, match="ADD"):
        sess.sql("ALTER TYPE ty_dup ADD ATTRIBUTE z int")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("DROP TYPE ty_never_created")
    sess.sql("DROP TYPE IF EXISTS ty_never_created")  # no error


def test_domain_constraints_enforced(sess):
    """distributed_domain.sql:9-22 + 46-54: CHECK enforced on writes,
    DEFAULT/NOT NULL from the domain, any clause order."""
    for t in ("ty_bar", "ty_addr"):
        sess.sql(f"DROP TABLE IF EXISTS {t}")
    for d in ("ty_age", "ty_zip", "ty_wd"):
        sess.sql(f"DROP DOMAIN IF EXISTS {d}")
    sess.sql("CREATE DOMAIN ty_age AS int CHECK( VALUE >= 0 )")
    sess.sql("CREATE TABLE ty_bar (a ty_age)")
    sess.sql("INSERT INTO ty_bar VALUES (5)")
    with pytest.raises(ValueError, match="check constraint"):
        sess.sql("INSERT INTO ty_bar VALUES (-1)")
    # regex-checked text domain (us_postal_code shape)
    sess.sql(
        "CREATE DOMAIN ty_zip AS TEXT CHECK( VALUE ~ '^\\d{5}$' )"
    )
    sess.sql("CREATE TABLE ty_addr (postal ty_zip NOT NULL)")
    sess.sql("INSERT INTO ty_addr VALUES ('12345')")
    with pytest.raises(ValueError, match="check constraint"):
        sess.sql("INSERT INTO ty_addr VALUES ('1234x')")
    # DEFAULT + NOT NULL + CHECK in one domain, CHECK-before-DEFAULT
    # order (distributed_domain.sql:52)
    sess.sql("CREATE DOMAIN ty_wd AS int CHECK (value > 0) DEFAULT 7")
    sess.sql("DROP TABLE IF EXISTS ty_wdt")
    sess.sql("CREATE TABLE ty_wdt (id int, v ty_wd)")
    sess.sql("INSERT INTO ty_wdt (id) VALUES (1)")
    assert sess.sql("SELECT v FROM ty_wdt").collect()[0][0] == 7
    sess.sql("DROP DOMAIN ty_age")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("DROP DOMAIN ty_age")


def test_procedure_sql_language(sess):
    """sql_procedure.sql:19-40: CALL runs the body sequentially with
    substituted arguments; COMMIT/ROLLBACK in a SQL body fail the
    whole CALL with no side effects."""
    sess.sql("DROP TABLE IF EXISTS ty_proc_t")
    for p in ("ty_p_di", "ty_p_commit"):
        sess.sql(f"DROP PROCEDURE IF EXISTS {p}")
    sess.sql("CREATE TABLE ty_proc_t (id integer, org_id integer)")
    sess.sql("INSERT INTO ty_proc_t VALUES (1, 1)")
    sess.sql(
        "CREATE PROCEDURE ty_p_di(id int, org_id int) LANGUAGE SQL "
        "AS $$ DELETE FROM ty_proc_t; "
        "INSERT INTO ty_proc_t VALUES(id, org_id); $$"
    )
    sess.sql("CALL ty_p_di(2,3)")
    assert [
        tuple(r)
        for r in sess.sql(
            "SELECT * FROM ty_proc_t ORDER BY 1, 2"
        ).collect()
    ] == [(2, 3)]
    sess.sql(
        "CREATE PROCEDURE ty_p_commit(tt_id int, tt_org_id int) "
        "LANGUAGE SQL AS $$ DELETE FROM ty_proc_t; COMMIT; "
        "INSERT INTO ty_proc_t VALUES(tt_id, -1); $$"
    )
    with pytest.raises(ValueError, match="transaction termination"):
        sess.sql("CALL ty_p_commit(2,5)")
    # the failed CALL left NO side effects (PG rolls the CALL back)
    assert [
        tuple(r) for r in sess.sql("SELECT * FROM ty_proc_t").collect()
    ] == [(2, 3)]
    with pytest.raises(ValueError, match="expects 2"):
        sess.sql("CALL ty_p_di(1)")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("CALL ty_p_never(1)")
    sess.sql("DROP PROCEDURE ty_p_di(int, int)")
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("CALL ty_p_di(2,3)")


def test_procedure_plpgsql(sess):
    """sql_procedure.sql:63-95: plpgsql BEGIN..END procedures; COMMIT
    is a no-op (autocommit == committed state), ROLLBACK rejects
    loudly BEFORE any statement runs."""
    sess.sql("DROP TABLE IF EXISTS ty_proc_p")
    for p in ("ty_pp", "ty_pp_rb"):
        sess.sql(f"DROP PROCEDURE IF EXISTS {p}")
    sess.sql("CREATE TABLE ty_proc_p (id integer, org_id integer)")
    sess.sql("INSERT INTO ty_proc_p VALUES (2, 3)")
    sess.sql(
        """CREATE PROCEDURE ty_pp(tt_id int, tt_org_id int)
LANGUAGE PLPGSQL AS $$
BEGIN
    UPDATE ty_proc_p SET org_id = tt_org_id WHERE id = tt_id;
    COMMIT;
    INSERT INTO ty_proc_p VALUES (tt_id, tt_org_id);
END;
$$"""
    )
    sess.sql("CALL ty_pp(2,30)")
    assert [
        tuple(r)
        for r in sess.sql(
            "SELECT * FROM ty_proc_p ORDER BY 1, 2"
        ).collect()
    ] == [(2, 30), (2, 30)]
    sess.sql(
        """CREATE PROCEDURE ty_pp_rb(x int) LANGUAGE PLPGSQL AS $$
BEGIN
    DELETE FROM ty_proc_p;
    ROLLBACK;
END;
$$"""
    )
    with pytest.raises(NotImplementedError, match="ROLLBACK"):
        sess.sql("CALL ty_pp_rb(1)")
    # rejected upfront — the DELETE never ran
    assert sess.sql("SELECT count(*) FROM ty_proc_p").collect()[0][0] == 2


def test_procedure_parse_rejections():
    from citus_spark.plans.type_sql import parse_create_procedure

    with pytest.raises(NotImplementedError, match="OUT"):
        parse_create_procedure(
            "CREATE PROCEDURE p(OUT x int) LANGUAGE SQL AS $$ SELECT 1 $$"
        )
    with pytest.raises(NotImplementedError, match="DECLARE"):
        parse_create_procedure(
            "CREATE PROCEDURE p(x int) LANGUAGE plpgsql AS $$ "
            "DECLARE y int; BEGIN SELECT 1; END; $$"
        )
    with pytest.raises(NotImplementedError, match="LANGUAGE c"):
        parse_create_procedure(
            "CREATE PROCEDURE p(x int) LANGUAGE C AS 'lib', 'sym'"
        )


# --- review-fix regressions (r9 code-review pass) ---------------------------

def test_substitute_params_word_boundaries():
    from citus_spark.plans.type_sql import substitute_params

    out = substitute_params(
        "UPDATE t SET total = cap WHERE capacity > 1 AND cap < 9",
        ["cap"], ["10"],
    )
    assert out == "UPDATE t SET total = (10) WHERE capacity > 1 AND (10) < 9"
    # longest-first: a parameter that prefixes another
    out2 = substitute_params("SELECT id, id_2", ["id", "id_2"], ["7", "8"])
    assert out2 == "SELECT (7), (8)"
    # literals stay put
    out3 = substitute_params("SELECT 'cap', cap", ["cap"], ["1"])
    assert out3 == "SELECT 'cap', (1)"


def test_field_access_rewrite_scoped():
    from citus_spark.plans.type_sql import rewrite_type_exprs

    types = {"ct": {"kind": "composite", "name": "ct",
                    "fields": [("a", "int")], "spark": "struct<a:int>"}}
    # function call result and string literal stay verbatim
    sql = "SELECT substr(x).y, 'keep (a).b' FROM t WHERE (c).a = 1"
    out = rewrite_type_exprs(sql, types)
    assert "substr(x).y" in out
    assert "'keep (a).b'" in out
    assert "c.a = 1" in out


def test_domain_column_default_precedence(spark):
    """PG: a column's own DEFAULT overrides the domain's."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_ddp")
    s.sql("DROP DOMAIN IF EXISTS ty_qd")
    s.sql("CREATE DOMAIN ty_qd AS int DEFAULT 1 CHECK (VALUE > 0)")
    s.sql("CREATE TABLE ty_ddp (id int, q ty_qd DEFAULT 5)")
    s.sql("INSERT INTO ty_ddp (id) VALUES (1)")
    assert s.sql("SELECT q FROM ty_ddp").collect()[0][0] == 5


def test_enum_ordering_is_table_scoped(spark):
    """Two tables binding the same column name to DIFFERENT enums:
    each table's statements use its own labels; a statement
    referencing both rejects loudly; a non-label literal raises like
    PG instead of silently dropping rows."""
    s = DistributedSession(spark)
    for t in ("ty_sc1", "ty_sc2"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    for ty in ("ty_ea", "ty_eb"):
        s.sql(f"DROP TYPE IF EXISTS {ty}")
    s.sql("CREATE TYPE ty_ea AS ENUM ('one', 'two', 'three')")
    s.sql("CREATE TYPE ty_eb AS ENUM ('yes', 'no')")
    s.sql("CREATE TABLE ty_sc1 (a int, b ty_ea)")
    s.sql("CREATE TABLE ty_sc2 (a int, b ty_eb)")
    s.sql("INSERT INTO ty_sc1 VALUES (1, 'one'), (2, 'three')")
    s.sql("INSERT INTO ty_sc2 VALUES (1, 'yes'), (2, 'no')")
    # each table resolves its own label set
    assert [
        x.a for x in s.sql(
            "SELECT a FROM ty_sc1 WHERE b > 'one' ORDER BY a"
        ).collect()
    ] == [2]
    assert [
        x.a for x in s.sql(
            "SELECT a FROM ty_sc2 ORDER BY b"
        ).collect()
    ] == [1, 2]
    # invalid label raises (PG parity), never returns zero rows
    with pytest.raises(ValueError, match="invalid input value"):
        s.sql("SELECT a FROM ty_sc1 WHERE b > 'warn'")
    # both tables in one statement with conflicting labels → loud
    with pytest.raises(NotImplementedError, match="different"):
        s.sql(
            "SELECT t1.a FROM ty_sc1 t1, ty_sc2 t2 "
            "WHERE t1.b > 'one' AND t2.a = t1.a"
        )


def test_drop_type_restrict(spark):
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_rt")
    s.sql("DROP TYPE IF EXISTS ty_er")
    s.sql("CREATE TYPE ty_er AS ENUM ('a', 'b')")
    s.sql("CREATE TABLE ty_rt (x ty_er)")
    with pytest.raises(ValueError, match="requires it"):
        s.sql("DROP TYPE ty_er")
    s.sql("DROP TABLE ty_rt")
    s.sql("DROP TYPE ty_er")  # now drops


def test_alter_table_add_enum_column(spark):
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_ac")
    s.sql("DROP TYPE IF EXISTS ty_lvl")
    s.sql("CREATE TYPE ty_lvl AS ENUM ('low', 'high')")
    s.sql("CREATE TABLE ty_ac (id int)")
    s.sql("INSERT INTO ty_ac VALUES (1)")
    s.sql("ALTER TABLE ty_ac ADD COLUMN lvl ty_lvl")
    s.sql("UPDATE ty_ac SET lvl = 'high' WHERE id = 1")
    with pytest.raises(ValueError, match="check constraint"):
        s.sql("INSERT INTO ty_ac VALUES (2, 'nope')")
    # ordering rewrite active for the added column
    assert s.sql(
        "SELECT count(*) FROM ty_ac WHERE lvl >= 'low'"
    ).collect()[0][0] == 1


def test_procedure_parenthesized_param_types():
    from citus_spark.plans.type_sql import parse_create_procedure

    name, params, lang, stmts = parse_create_procedure(
        "CREATE PROCEDURE p(a numeric(8,2), b int) LANGUAGE SQL "
        "AS $$ SELECT 1; $$"
    )
    assert params == [("a", "numeric(8,2)"), ("b", "int")]


# --- second review pass (r9) ------------------------------------------------

def test_composite_cast_not_applied_to_calls():
    from citus_spark.plans.type_sql import rewrite_type_exprs

    types = {"ct": {"kind": "composite", "name": "ct",
                    "fields": [("a", "int"), ("b", "int")],
                    "spark": "struct<a:int,b:int>"}}
    # function-call cast stays intact (Spark would reject ::ct, which
    # is loud — but the call itself must not be mangled)
    out = rewrite_type_exprs("SELECT f(x, y)::ct FROM t", types)
    assert "f(x, y)" in out and "fnamed_struct" not in out
    # plain row cast still expands
    out2 = rewrite_type_exprs("SELECT (x, y)::ct FROM t", types)
    assert "named_struct('a', x, 'b', y)" in out2


def test_enum_qualified_references(spark):
    """alias.col references get the declaration-order rewrite too
    (review fix: they silently fell back to lexical order)."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_q1")
    s.sql("DROP TYPE IF EXISTS ty_eq")
    s.sql("CREATE TYPE ty_eq AS ENUM ('one', 'two', 'three')")
    s.sql("CREATE TABLE ty_q1 (a int, b ty_eq)")
    s.sql("INSERT INTO ty_q1 VALUES (1,'one'), (2,'two'), (3,'three')")
    assert [
        x.a for x in s.sql(
            "SELECT t.a FROM ty_q1 t WHERE t.b > 'two' ORDER BY t.a"
        ).collect()
    ] == [3]
    assert [
        x.a for x in s.sql(
            "SELECT t.a FROM ty_q1 t ORDER BY t.b"
        ).collect()
    ] == [1, 2, 3]
    mx = s.sql("SELECT max(t.b) AS m FROM ty_q1 t").collect()[0][0]
    assert mx == "three"
    # a literal containing min(b) stays text
    r = s.sql(
        "SELECT 'min(b) is here' AS lit, b FROM ty_q1 ORDER BY b LIMIT 1"
    ).collect()[0]
    assert r.lit == "min(b) is here" and r.b == "one"


def test_enum_conflict_only_on_use(spark):
    """Two same-named columns of different enums: harmless statements
    (no ordering/comparison on the column) run fine; only a rewrite
    site raises (review fix: building the map raised eagerly)."""
    s = DistributedSession(spark)
    for t in ("ty_cf1", "ty_cf2"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    for ty in ("ty_ca", "ty_cb"):
        s.sql(f"DROP TYPE IF EXISTS {ty}")
    s.sql("CREATE TYPE ty_ca AS ENUM ('one', 'two')")
    s.sql("CREATE TYPE ty_cb AS ENUM ('yes', 'no')")
    s.sql("CREATE TABLE ty_cf1 (a int, b ty_ca)")
    s.sql("CREATE TABLE ty_cf2 (a int, b ty_cb)")
    s.sql("INSERT INTO ty_cf1 VALUES (1, 'one')")
    s.sql("INSERT INTO ty_cf2 VALUES (1, 'yes')")
    # no enum ordering used → no error
    assert s.sql(
        "SELECT count(*) FROM ty_cf1, ty_cf2"
    ).collect()[0][0] == 1
    # equality too
    assert s.sql(
        "SELECT count(*) FROM ty_cf1 t1 JOIN ty_cf2 t2 ON t1.a = t2.a"
    ).collect()[0][0] == 1
    # ordering on the ambiguous column raises
    with pytest.raises(NotImplementedError, match="different label"):
        s.sql(
            "SELECT t1.a FROM ty_cf1 t1, ty_cf2 t2 WHERE b > 'one'"
        )


def test_drop_rename_column_updates_enum_registry(spark):
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_dc")
    s.sql("DROP TYPE IF EXISTS ty_de")
    s.sql("CREATE TYPE ty_de AS ENUM ('a', 'b')")
    s.sql("CREATE TABLE ty_dc (x ty_de, y int)")
    s.sql("ALTER TABLE ty_dc RENAME COLUMN x TO z")
    s.sql("INSERT INTO ty_dc VALUES ('b', 1)")
    # renamed column still enum-ordered
    assert s.sql(
        "SELECT count(*) FROM ty_dc WHERE z >= 'a'"
    ).collect()[0][0] == 1
    s.sql("ALTER TABLE ty_dc DROP COLUMN z")
    # with the column gone, the type drops (RESTRICT satisfied)
    s.sql("DROP TYPE ty_de")


def test_procedure_language_not_hijacked_by_body_literals():
    from citus_spark.plans.type_sql import parse_create_procedure

    name, params, lang, stmts = parse_create_procedure(
        "CREATE PROCEDURE p(x int) AS $$ INSERT INTO log VALUES "
        "('language c rocks'); $$ LANGUAGE sql"
    )
    assert lang == "sql"
    name2, _, lang2, _ = parse_create_procedure(
        "CREATE PROCEDURE p2(x int) AS $$ INSERT INTO log VALUES "
        "('LANGUAGE plpgsql'); $$ LANGUAGE sql"
    )
    assert lang2 == "sql"


def test_domain_default_survives_fk_set_default():
    from citus_spark.plans.type_sql import expand_udt_columns

    types = {"ty_qd": {"kind": "domain", "name": "ty_qd",
                       "spark": "int", "base": "int", "default": "1",
                       "not_null": False, "checks": []}}
    out, _ = expand_udt_columns(
        "CREATE TABLE t (id int, q ty_qd REFERENCES p(i) "
        "ON DELETE SET DEFAULT)",
        types,
    )
    # the domain's DEFAULT 1 is still applied — the FK action's SET
    # DEFAULT is not a column default (review fix)
    assert "DEFAULT 1" in out
    # but an explicit column default suppresses the domain's
    out2, _ = expand_udt_columns(
        "CREATE TABLE t (id int, q ty_qd DEFAULT 5)", types
    )
    assert "DEFAULT 1" not in out2 and "DEFAULT 5" in out2


def test_copy_stdin_payload_not_rewritten(spark):
    """COPY payload lines are DATA — the composite/enum rewrites must
    not fire inside them (review fix)."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_cp")
    s.sql("DROP TYPE IF EXISTS ty_ce")
    s.sql("CREATE TYPE ty_ce AS ENUM ('one', 'two')")
    s.sql("CREATE TABLE ty_cp (note text, b ty_ce)")
    s.sql(
        "COPY ty_cp (note, b) FROM STDIN;\n"
        "(note).ref and min(b) > 'one'\tone\n"
        "\\.\n"
    )
    r = s.sql("SELECT note, b FROM ty_cp").collect()[0]
    assert r.note == "(note).ref and min(b) > 'one'" and r.b == "one"


def test_enum_between_col_cmp_greatest(spark):
    """r9 ADVICE #1: BETWEEN, column-to-column comparison, and
    GREATEST/LEAST on enum columns follow declaration order (were
    silently lexical)."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_ord")
    s.sql("DROP TYPE IF EXISTS ty_sev")
    s.sql("CREATE TYPE ty_sev AS ENUM ('low', 'medium', 'high')")
    s.sql("CREATE TABLE ty_ord (id int, lvl ty_sev, lvl2 ty_sev)")
    s.sql(
        "INSERT INTO ty_ord VALUES (1, 'low', 'high'), "
        "(2, 'medium', 'medium'), (3, 'high', 'low')"
    )
    # BETWEEN by rank: 'high' > 'medium' declaration-wise even though
    # 'high' < 'medium' lexically
    r = s.sql(
        "SELECT id FROM ty_ord WHERE lvl BETWEEN 'medium' AND 'high' "
        "ORDER BY id"
    ).collect()
    assert [x[0] for x in r] == [2, 3]
    r = s.sql(
        "SELECT id FROM ty_ord WHERE lvl NOT BETWEEN 'medium' AND 'high' "
        "ORDER BY id"
    ).collect()
    assert [x[0] for x in r] == [1]
    # col-vs-col: lvl < lvl2 by declaration rank → only id=1
    r = s.sql(
        "SELECT id FROM ty_ord WHERE lvl < lvl2 ORDER BY id"
    ).collect()
    assert [x[0] for x in r] == [1]
    # greatest/least back-map to labels by rank
    r = s.sql(
        "SELECT id, greatest(lvl, lvl2) AS g, least(lvl, 'medium') AS l "
        "FROM ty_ord ORDER BY id"
    ).collect()
    assert [(x[0], x[1], x[2]) for x in r] == [
        (1, "high", "low"), (2, "medium", "medium"), (3, "high", "medium"),
    ]
    # invalid label in BETWEEN raises like PG
    with pytest.raises(Exception, match="invalid input value"):
        s.sql("SELECT * FROM ty_ord WHERE lvl BETWEEN 'nope' AND 'high'")


def test_enum_unreachable_ordered_use_rejects(spark):
    """r9 ADVICE #1 guard: ordered enum uses outside the rewrite forms
    (subquery comparison, quantified) reject loudly instead of
    comparing lexically."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS ty_grd")
    s.sql("DROP TYPE IF EXISTS ty_gsev")
    s.sql("CREATE TYPE ty_gsev AS ENUM ('low', 'high')")
    s.sql("CREATE TABLE ty_grd (id int, lvl ty_gsev)")
    s.sql("INSERT INTO ty_grd VALUES (1, 'low')")
    with pytest.raises(NotImplementedError, match="ordered use of enum"):
        s.sql(
            "SELECT * FROM ty_grd WHERE lvl < (SELECT max(lvl) FROM ty_grd)"
        )
    # equality needs no shim and is untouched by the guard
    assert s.sql(
        "SELECT count(*) FROM ty_grd WHERE lvl = 'low'"
    ).collect()[0][0] == 1


def test_enum_vs_plain_column_shadowing(spark):
    """r9 ADVICE #2: a referenced table with a same-named NON-enum
    column makes the bare name conflicted — ordering it raises instead
    of mis-rewriting the plain column with the enum's labels."""
    s = DistributedSession(spark)
    for t in ("ty_sh1", "ty_sh2"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("DROP TYPE IF EXISTS ty_shen")
    s.sql("CREATE TYPE ty_shen AS ENUM ('a', 'b')")
    s.sql("CREATE TABLE ty_sh1 (id int, status ty_shen)")
    s.sql("CREATE TABLE ty_sh2 (id int, status string)")
    s.sql("INSERT INTO ty_sh1 VALUES (1, 'a')")
    s.sql("INSERT INTO ty_sh2 VALUES (1, 'zzz')")
    # both referenced + ordered use → conflict raise (before this fix:
    # b.status > 'zzz' was rewritten with the enum's labels →
    # spurious invalid-label error)
    with pytest.raises(NotImplementedError, match="different types|different label|distinct column"):
        s.sql(
            "SELECT count(*) FROM ty_sh1 a, ty_sh2 b WHERE status > 'a'"
        )
    # single-table statements keep working on both
    assert s.sql(
        "SELECT count(*) FROM ty_sh2 WHERE status > 'a'"
    ).collect()[0][0] == 1
    assert s.sql(
        "SELECT count(*) FROM ty_sh1 WHERE status >= 'b'"
    ).collect()[0][0] == 0
