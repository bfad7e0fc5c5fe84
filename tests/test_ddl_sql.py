"""Textual DDL (plans/ddl_sql.py): the full reference-tutorial opening
sequence runs verbatim — CREATE EXTENSION, CREATE TABLE with PG types
and constraints, create_distributed_table, COPY, INSERT, CREATE
INDEX, DROP TABLE."""

import pytest

from citus_spark.session import DistributedSession


def test_tutorial_opening_sequence(spark, tmp_path):
    s = DistributedSession(spark)
    s.sql("CREATE EXTENSION citus;")
    s.sql(
        """
        CREATE TABLE companies (
          id bigint PRIMARY KEY,
          name text NOT NULL,
          price numeric(12,2) DEFAULT 0,
          score double precision,
          created_at timestamp with time zone,
          active boolean DEFAULT true,
          tags text[],
          meta jsonb
        );
        """
    )
    assert s.catalog.get("companies") is not None
    schema = dict(spark.table("companies").dtypes)
    assert schema["id"] == "bigint"
    assert schema["price"] == "decimal(12,2)"
    assert schema["score"] == "double"
    assert schema["created_at"] == "timestamp"
    assert schema["tags"] == "array<string>"
    assert schema["meta"] == "string"

    s.sql("SELECT create_distributed_table('companies', 'id')")
    s.sql(
        "INSERT INTO companies (id, name, price, active) VALUES "
        "(1, 'acme', 10.5, true), (2, 'globex', 20.0, false)"
    )
    s.sql("CREATE INDEX ON companies (name);")
    got = {r.id: (r.name, float(r.price), r.active)
           for r in spark.table("companies").collect()}
    assert got == {1: ("acme", 10.5, True), 2: ("globex", 20.0, False)}
    # no-op transaction control is accepted
    s.sql("BEGIN;")
    s.sql("COMMIT;")

    s.sql("DROP TABLE companies;")
    assert s.catalog.get("companies") is None
    with pytest.raises(Exception):
        spark.table("companies")
    # IF EXISTS variants
    s.sql("DROP TABLE IF EXISTS companies;")
    s.sql("CREATE TABLE IF NOT EXISTS t2 (k int); ")
    s.sql("CREATE TABLE IF NOT EXISTS t2 (k int); ")  # second = skip
    s.sql("DROP TABLE t2")


def test_create_table_rejects_unknown_type(spark):
    s = DistributedSession(spark)
    with pytest.raises(ValueError, match="unsupported PostgreSQL type"):
        s.sql("CREATE TABLE bad (g geometry)")


def test_table_constraints_registered(spark):
    # inline constraints are REAL since round 6 (plans/constraints.py):
    # they register in the catalog and a column-level REFERENCES to a
    # missing relation errors like PG
    s = DistributedSession(spark)
    s.sql("CREATE TABLE companies_ddl (id bigint PRIMARY KEY, name text)")
    s.sql(
        """
        CREATE TABLE orders_ddl (
          id bigint,
          cust bigint REFERENCES companies_ddl (id),
          total numeric,
          PRIMARY KEY (id),
          UNIQUE (cust, id),
          CHECK (total >= 0)
        )
        """
    )
    assert dict(spark.table("orders_ddl").dtypes) == {
        "id": "bigint", "cust": "bigint", "total": "decimal(38,18)",
    }
    cons = s.catalog.get("orders_ddl").constraints
    kinds = sorted(c["kind"] for c in cons.values())
    assert kinds == ["c", "f", "p", "u"]
    s.sql("DROP TABLE orders_ddl")
    s.sql("DROP TABLE companies_ddl")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not exist"):
        s.sql(
            "CREATE TABLE orphan_ddl "
            "(id bigint REFERENCES no_such_table (id))"
        )


def test_alter_table_column_lifecycle(spark):
    s = DistributedSession(spark)
    s.sql("CREATE TABLE alt_t (id bigint, v text)")
    s.sql("INSERT INTO alt_t VALUES (1, 'a'), (2, 'b')")
    s.sql("ALTER TABLE alt_t ADD COLUMN score double precision")
    assert dict(spark.table("alt_t").dtypes)["score"] == "double"
    assert spark.table("alt_t").filter("score IS NULL").count() == 2
    s.sql("UPDATE alt_t SET score = id * 1.5")
    s.sql("ALTER TABLE alt_t RENAME COLUMN v TO label")
    got = {r.id: (r.label, r.score)
           for r in spark.table("alt_t").collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 3.0)}
    s.sql("ALTER TABLE alt_t DROP COLUMN label")
    assert "label" not in spark.table("alt_t").columns
    s.sql("ALTER TABLE alt_t RENAME TO alt_renamed")
    assert s.catalog.get("alt_t") is None
    assert spark.table("alt_renamed").count() == 2
    import pytest

    with pytest.raises(NotImplementedError, match="unsupported action"):
        s.sql("ALTER TABLE alt_renamed SET LOGGED")
    s.sql("DROP TABLE alt_renamed")


# -- second-review regressions


def test_add_column_default_backfills(spark):
    s = DistributedSession(spark)
    s.sql("CREATE TABLE defat (id bigint)")
    s.sql("INSERT INTO defat VALUES (1), (2)")
    s.sql("ALTER TABLE defat ADD COLUMN clicks bigint DEFAULT 7")
    assert [r.clicks for r in spark.table("defat").collect()] == [7, 7]
    s.sql("ALTER TABLE defat ADD COLUMN note text DEFAULT 'n/a' NOT NULL")
    assert {r.note for r in spark.table("defat").collect()} == {"n/a"}
    s.sql("DROP TABLE defat")


def test_create_table_name_reuse_after_rename(spark):
    """Recreating a dropped/renamed name must NOT clobber the renamed
    table's storage (paths are content-unique)."""
    s = DistributedSession(spark)
    s.sql("CREATE TABLE reuse_t (k int)")
    s.sql("INSERT INTO reuse_t VALUES (1), (2)")
    s.sql("ALTER TABLE reuse_t RENAME TO reuse_renamed")
    s.sql("CREATE TABLE reuse_t (k int)")
    assert spark.table("reuse_renamed").count() == 2  # data intact
    assert spark.table("reuse_t").count() == 0
    s.sql("DROP TABLE reuse_t")
    s.sql("DROP TABLE reuse_renamed")


# -- round-7: ALTER COLUMN TYPE + literal-masked constraint parsing


def test_alter_column_type(spark):
    import pytest

    s = DistributedSession(spark)
    s.sql("CREATE TABLE att (id int, amount text, label text)")
    s.sql("INSERT INTO att VALUES (1, '10', 'a'), (2, '20', 'b')")
    s.sql("ALTER TABLE att ALTER COLUMN amount TYPE bigint")
    assert dict(spark.table("att").dtypes)["amount"] == "bigint"
    assert sorted(r.amount for r in spark.table("att").collect()) == [10, 20]
    # widening int -> double via SET DATA TYPE spelling
    s.sql("ALTER TABLE att ALTER COLUMN amount SET DATA TYPE double precision")
    assert dict(spark.table("att").dtypes)["amount"] == "double"
    # a non-convertible cast fails loudly, nothing rewritten
    with pytest.raises(ValueError, match="USING"):
        s.sql("ALTER TABLE att ALTER COLUMN label TYPE integer")
    assert dict(spark.table("att").dtypes)["label"] == "string"
    # ...unless a USING expression says how
    s.sql(
        "ALTER TABLE att ALTER COLUMN label TYPE integer "
        "USING length(label)"
    )
    assert sorted(r.label for r in spark.table("att").collect()) == [1, 1]
    s.sql("DROP TABLE att")


def test_alter_column_type_revalidates_constraints(spark):
    import pytest

    s = DistributedSession(spark)
    s.sql("CREATE TABLE attc (id int PRIMARY KEY, v text CHECK (v > '0'))")
    s.sql("INSERT INTO attc VALUES (1, '5'), (2, '7')")
    # cast keeps CHECK satisfied (string '5' -> 5 > implicit '0'... the
    # CHECK re-judges against the NEW values)
    s.sql("ALTER TABLE attc ALTER COLUMN v TYPE int")
    # narrowing id would keep uniqueness here; a cast that collides
    # must fail: make two ids collide modulo the USING expression
    with pytest.raises(ValueError, match="unique"):
        s.sql("ALTER TABLE attc ALTER COLUMN id TYPE int USING 1")
    assert sorted(r.id for r in spark.table("attc").collect()) == [1, 2]
    s.sql("DROP TABLE attc")


def test_constraint_keywords_inside_literals_ignored(spark):
    s = DistributedSession(spark)
    # a DEFAULT string containing constraint keywords must not
    # fabricate phantom constraints (regex runs over masked text)
    s.sql(
        "CREATE TABLE litmask (id int PRIMARY KEY, "
        "note text DEFAULT 'UNIQUE REFERENCES ghost(x) CHECK(', "
        "status text CHECK (status <> ':-)'))"
    )
    cons = s.catalog.get("litmask").constraints
    assert set(cons) == {"litmask_pkey", "litmask_status_check"}
    assert s.catalog.get("litmask").defaults["note"].startswith("'UNIQUE")
    s.sql("INSERT INTO litmask VALUES (1, 'n', 'ok')")
    import pytest

    with pytest.raises(ValueError, match="check"):
        s.sql("INSERT INTO litmask VALUES (2, 'n', ':-)')")
    s.sql("DROP TABLE litmask")


def test_two_unnamed_checks_get_distinct_names(spark):
    s = DistributedSession(spark)
    s.sql(
        "CREATE TABLE twock (a int, b int, CHECK (a > 0), CHECK (b > 0))"
    )
    cons = s.catalog.get("twock").constraints
    assert "twock_check" in cons and "twock_check1" in cons
    s.sql("DROP TABLE twock")


def test_alter_column_set_drop_default(spark):
    sess = DistributedSession(spark)
    sess.sql("CREATE TABLE acd_t (a int, b int)")
    sess.sql("INSERT INTO acd_t (a) VALUES (1)")
    sess.sql("ALTER TABLE acd_t ALTER COLUMN b SET DEFAULT 42")
    # existing rows untouched (PG: SET DEFAULT affects future writes)
    assert spark.table("acd_t").collect()[0].b is None
    sess.sql("INSERT INTO acd_t (a) VALUES (2)")
    rows = {r.a: r.b for r in spark.table("acd_t").collect()}
    assert rows == {1: None, 2: 42}
    sess.sql("ALTER TABLE acd_t ALTER COLUMN b DROP DEFAULT")
    sess.sql("INSERT INTO acd_t (a) VALUES (3)")
    rows = {r.a: r.b for r in spark.table("acd_t").collect()}
    assert rows[3] is None
    sess.sql("DROP TABLE acd_t")


def test_alter_column_not_null_lifecycle(spark):
    sess = DistributedSession(spark)
    sess.sql("CREATE TABLE ann_t (a int, b int)")
    sess.sql("INSERT INTO ann_t VALUES (1, NULL)")
    # existing NULL blocks SET NOT NULL (validated distributedly)
    with pytest.raises(ValueError, match="contains null values"):
        sess.sql("ALTER TABLE ann_t ALTER COLUMN b SET NOT NULL")
    sess.sql("UPDATE ann_t SET b = 0 WHERE b IS NULL")
    sess.sql("ALTER TABLE ann_t ALTER COLUMN b SET NOT NULL")
    # enforced on later writes
    with pytest.raises(ValueError, match="check constraint"):
        sess.sql("INSERT INTO ann_t VALUES (2, NULL)")
    sess.sql("ALTER TABLE ann_t ALTER COLUMN b DROP NOT NULL")
    sess.sql("INSERT INTO ann_t VALUES (2, NULL)")
    assert spark.table("ann_t").count() == 2
    # a PK column's not-null cannot be dropped (PG)
    sess.sql("ALTER TABLE ann_t ADD CONSTRAINT pk PRIMARY KEY (a)")
    with pytest.raises(ValueError, match="in a primary key"):
        sess.sql("ALTER TABLE ann_t ALTER COLUMN a DROP NOT NULL")
    sess.sql("DROP TABLE ann_t")


def test_inline_not_null_enforces(spark):
    """CREATE TABLE (col .. NOT NULL) records the same enforcing
    constraint ALTER COLUMN SET NOT NULL creates — a NULL insert must
    reject like PG, not load silently (it was advisory before r8)."""
    import pytest as _pytest

    sess = DistributedSession(spark)
    sess.sql("DROP TABLE IF EXISTS nn_t")
    sess.sql("CREATE TABLE nn_t (id bigint NOT NULL, name text)")
    with _pytest.raises(Exception, match="not_null"):
        sess.sql("INSERT INTO nn_t VALUES (NULL, 'a')")
    sess.sql("INSERT INTO nn_t VALUES (1, 'a')")
    # a CHECK body containing NOT NULL must not fabricate a column
    # constraint
    sess.sql("DROP TABLE IF EXISTS nn_c")
    sess.sql(
        "CREATE TABLE nn_c (a bigint, b bigint "
        "CHECK (a IS NOT NULL OR b IS NOT NULL))"
    )
    assert "nn_c_b_not_null" not in (
        sess.catalog.get("nn_c").constraints or {}
    )
    # DROP NOT NULL detaches the inline-declared constraint
    sess.sql("ALTER TABLE nn_t ALTER COLUMN id DROP NOT NULL")
    sess.sql("INSERT INTO nn_t VALUES (NULL, 'b')")
    assert sess.sql("SELECT count(*) FROM nn_t").collect()[0][0] == 2


def test_create_table_like(spark):
    """CREATE TABLE (LIKE src [INCLUDING ..]) clones the shape:
    columns + NOT NULL always; DEFAULTS/CONSTRAINTS/INDEXES under
    their options or ALL; mixes with extra columns."""
    import pytest as _pytest

    s = DistributedSession(spark)
    for t in ("lk_src", "lk_all", "lk_bare", "lk_mix"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql(
        "CREATE TABLE lk_src (id bigint NOT NULL, name text DEFAULT "
        "'anon', amt numeric(10,2), CHECK (amt IS NULL OR amt >= 0), "
        "UNIQUE (id))"
    )
    s.sql("CREATE TABLE lk_all (LIKE lk_src INCLUDING ALL)")
    cons = s.catalog.get("lk_all").constraints or {}
    kinds = sorted(spec["kind"] for spec in cons.values())
    assert kinds == ["c", "c", "u"]  # not-null, check, unique
    assert (s.catalog.get("lk_all").defaults or {}) == {"name": "'anon'"}
    s.sql("INSERT INTO lk_all (id, amt) VALUES (1, 5.5)")
    assert s.sql("SELECT name FROM lk_all").collect()[0][0] == "anon"
    with _pytest.raises(Exception, match="not_null"):
        s.sql("INSERT INTO lk_all (id, amt) VALUES (NULL, 1)")
    with _pytest.raises(Exception, match="check"):
        s.sql("INSERT INTO lk_all (id, amt) VALUES (2, -4)")
    # bare LIKE: columns + NOT NULL only
    s.sql("CREATE TABLE lk_bare (LIKE lk_src)")
    bare = s.catalog.get("lk_bare").constraints or {}
    assert [spec["kind"] for spec in bare.values()] == ["c"]
    assert not (s.catalog.get("lk_bare").defaults or {})
    # LIKE mixes with ordinary column items
    s.sql("CREATE TABLE lk_mix (LIKE lk_src, extra boolean)")
    assert dict(spark.table("lk_mix").dtypes)["extra"] == "boolean"
    with _pytest.raises(ValueError, match="does not exist"):
        s.sql("CREATE TABLE lk_no (LIKE no_such_rel)")


def test_dump_replay_noops_and_if_exists(spark):
    """pg_dump-emitted maintenance/ownership statements accept as
    recorded no-ops; DROP COLUMN IF EXISTS tolerates absence."""
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS dr_t")
    s.sql("CREATE TABLE dr_t (id bigint, name text)")
    for stmt in (
        "ALTER TABLE dr_t OWNER TO admin",
        "ALTER TABLE dr_t ALTER COLUMN name SET STORAGE EXTERNAL",
        "ALTER TABLE dr_t ALTER COLUMN name SET STATISTICS 500",
        "ALTER TABLE dr_t SET (fillfactor = 70)",
        "REINDEX TABLE dr_t",
        "CLUSTER dr_t USING some_idx",
    ):
        assert s.sql(stmt).collect()  # accepted, informational row
    s.sql("ALTER TABLE dr_t DROP COLUMN IF EXISTS nosuch")
    s.sql("ALTER TABLE dr_t DROP COLUMN IF EXISTS name")
    assert spark.table("dr_t").columns == ["id"]


def test_temp_unlogged_tables_and_session_noops(spark):
    """CREATE TEMP/TEMPORARY/UNLOGGED TABLE parse as plain CREATE
    (everything here is session-scoped and un-logged already);
    ON COMMIT PRESERVE ROWS strips; DROP/DELETE ROWS reject loudly.
    DROP INDEX / LOCK / DISCARD / SHOW accept."""
    import pytest as _pytest

    s = DistributedSession(spark)
    for t in ("tm1", "tm2", "tm3"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TEMP TABLE tm1 (id bigint)")
    s.sql("CREATE TEMPORARY TABLE tm2 (id bigint) ON COMMIT PRESERVE ROWS")
    s.sql("CREATE UNLOGGED TABLE tm3 (id bigint NOT NULL)")
    s.sql("INSERT INTO tm1 VALUES (1)")
    assert s.sql("SELECT count(*) FROM tm1").collect()[0][0] == 1
    with _pytest.raises(NotImplementedError, match="ON COMMIT"):
        s.sql("CREATE TEMP TABLE tm4 (id bigint) ON COMMIT DROP")
    assert s.catalog.get("tm4") is None
    for stmt in (
        "DROP INDEX IF EXISTS some_idx",
        "DROP INDEX CONCURRENTLY other_idx",
        "LOCK TABLE tm1 IN ACCESS EXCLUSIVE MODE",
        "LOCK tm1",
        "DISCARD ALL",
    ):
        assert s.sql(stmt).collect()
    s.sql("SET work_mem = '128MB'")
    assert s.sql("SHOW work_mem").collect()[0][0] == "'128MB'"


def test_temp_table_like_composes(spark):
    """CREATE TEMP TABLE (LIKE src) — the classic scratch-clone idiom
    (review fix: the LIKE gate only matched plain CREATE TABLE)."""
    s = DistributedSession(spark)
    for t in ("cl_src", "cl_tmp"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE cl_src (id bigint NOT NULL, v text DEFAULT 'd')")
    s.sql("CREATE TEMP TABLE cl_tmp (LIKE cl_src INCLUDING ALL)")
    s.sql("INSERT INTO cl_tmp (id) VALUES (1)")
    assert s.sql("SELECT v FROM cl_tmp").collect()[0][0] == "d"


def test_show_spark_commands_not_hijacked(spark):
    """SHOW FUNCTIONS/SCHEMAS must keep reaching Spark; an unset GUC
    errors like PG instead of returning '<undefined>' (review fix)."""
    import pytest as _pytest

    s = DistributedSession(spark)
    assert s.sql("SHOW SCHEMAS").count() >= 1
    assert s.sql("SHOW FUNCTIONS").count() > 100
    with _pytest.raises(ValueError, match="unrecognized configuration"):
        s.sql("SHOW never_set_parameter")


def test_create_like_copies_pk_implied_not_null(spark):
    """PG's LIKE always copies the NOT NULL a PRIMARY KEY implies,
    even without INCLUDING INDEXES; information_schema.columns also
    reports is_nullable='NO' for PK columns (review fix)."""
    import pytest as _pytest

    s = DistributedSession(spark)
    for t in ("pknn_src", "pknn_clone"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE pknn_src (id bigint PRIMARY KEY, v text)")
    s.sql("CREATE TABLE pknn_clone (LIKE pknn_src)")
    with _pytest.raises(Exception, match="(?i)null"):
        s.sql("INSERT INTO pknn_clone VALUES (NULL, 'x')")
    s.sql("INSERT INTO pknn_clone VALUES (1, 'ok')")
    assert s.sql("SELECT count(*) FROM pknn_clone").collect()[0][0] == 1
    rows = s.sql(
        "SELECT column_name, is_nullable FROM information_schema.columns "
        "WHERE table_name = 'pknn_src' ORDER BY ordinal_position"
    ).collect()
    assert [tuple(r) for r in rows] == [("id", "NO"), ("v", "YES")]


def test_show_time_zone_and_show_all(spark):
    """SHOW TIME ZONE maps to the session timezone; SHOW ALL dumps the
    explicitly-set parameters with name/setting columns (review fix:
    multi-word SHOW fell through to Spark and errored)."""
    s = DistributedSession(spark)
    tz = s.sql("SHOW TIME ZONE").collect()[0][0]
    assert tz == spark.conf.get("spark.sql.session.timeZone")
    s.sql("SET work_mem = '64MB'")
    allrows = s.sql("SHOW ALL")
    assert allrows.columns == ["name", "setting"]
    vals = {r["name"]: r["setting"] for r in allrows.collect()}
    assert vals.get("work_mem") == "'64MB'"
