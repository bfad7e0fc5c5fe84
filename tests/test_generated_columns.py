"""Stored generated columns + column DEFAULT semantics
(↔ PG GENERATED ALWAYS AS (expr) STORED — used by the reference
regress, e.g. local_shard_execution.sql; DEFAULT fill on INSERT was
previously NULL-filled, silent wrong data)."""

import pytest

from citus_spark.session import DistributedSession


@pytest.fixture()
def sess(spark):
    s = DistributedSession(spark)
    yield s
    for t in ("gen_t", "gd_t", "gtp_t"):
        try:
            s.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass


def test_insert_fills_column_defaults(sess, spark):
    sess.sql(
        "CREATE TABLE gd_t (a int, b int DEFAULT 5, c text DEFAULT 'x')"
    )
    sess.sql("INSERT INTO gd_t (a) VALUES (1)")
    r = spark.table("gd_t").collect()[0]
    assert (r.a, r.b, r.c) == (1, 5, "x")
    # explicit DEFAULT token in VALUES, mixed with real values
    sess.sql("INSERT INTO gd_t (a, b, c) VALUES (2, DEFAULT, 'y'), "
             "(3, 30, DEFAULT)")
    rows = {r.a: (r.b, r.c) for r in spark.table("gd_t").collect()}
    assert rows[2] == (5, "y") and rows[3] == (30, "x")
    # DEFAULT token on every defaulted column
    sess.sql("INSERT INTO gd_t (a, b, c) VALUES (4, DEFAULT, DEFAULT)")
    rows = {r.a: (r.b, r.c) for r in spark.table("gd_t").collect()}
    assert rows[4] == (5, "x")
    # a column with NO declared default: DEFAULT → NULL (PG)
    sess.sql("DROP TABLE gd_t")
    sess.sql("CREATE TABLE gd_t (a int, b int)")
    sess.sql("INSERT INTO gd_t (a, b) VALUES (9, DEFAULT)")
    assert spark.table("gd_t").collect()[0].b is None


def test_generated_column_lifecycle(sess, spark):
    sess.sql(
        "CREATE TABLE gen_t (a int, b int GENERATED ALWAYS AS (a * 2) "
        "STORED, note text)"
    )
    sess.sql("INSERT INTO gen_t (a, note) VALUES (3, 'x'), (5, 'y')")
    rows = {r.a: r.b for r in spark.table("gen_t").collect()}
    assert rows == {3: 6, 5: 10}
    # bare INSERT targets only non-generated columns
    sess.sql("INSERT INTO gen_t VALUES (7, 'z')")
    assert {
        r.a: r.b for r in spark.table("gen_t").collect()
    } == {3: 6, 5: 10, 7: 14}
    # explicit insert into the generated column rejects (PG error)
    with pytest.raises(ValueError, match="generated column"):
        sess.sql("INSERT INTO gen_t (a, b) VALUES (1, 99)")
    # UPDATE of a base column recomputes the generated one
    sess.sql("UPDATE gen_t SET a = a + 1 WHERE note = 'x'")
    assert {
        r.note: (r.a, r.b) for r in spark.table("gen_t").collect()
    }["x"] == (4, 8)
    # direct assignment rejected; SET b = DEFAULT allowed
    with pytest.raises(ValueError, match="only be updated to DEFAULT"):
        sess.sql("UPDATE gen_t SET b = 1")
    sess.sql("UPDATE gen_t SET b = DEFAULT WHERE note = 'y'")
    assert {
        r.note: r.b for r in spark.table("gen_t").collect()
    }["y"] == 10


def test_generated_column_merge_and_alter(sess, spark):
    sess.sql(
        "CREATE TABLE gen_t (k int, v int, "
        "dbl int GENERATED ALWAYS AS (v * 2) STORED)"
    )
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 10), (2, 20)")
    spark.sql("SELECT 1 AS k, 100 AS nv UNION ALL SELECT 9, 900") \
        .createOrReplaceTempView("gen_src")
    sess.sql(
        """
        MERGE INTO gen_t AS t USING gen_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
        """
    )
    rows = {r.k: (r.v, r.dbl) for r in spark.table("gen_t").collect()}
    assert rows == {1: (100, 200), 2: (20, 40), 9: (900, 1800)}
    # dropping a referenced base column rejects; dropping the
    # generated column succeeds
    with pytest.raises(ValueError, match='generated column "dbl"'):
        sess.sql("ALTER TABLE gen_t DROP COLUMN v")
    sess.sql("ALTER TABLE gen_t DROP COLUMN dbl")
    sess.sql("ALTER TABLE gen_t DROP COLUMN v")  # now free


def test_generated_rejects_bad_shapes(sess):
    # VIRTUAL (or missing STORED) rejected
    with pytest.raises(NotImplementedError, match="STORED"):
        sess.sql(
            "CREATE TABLE gen_t (a int, b int GENERATED ALWAYS AS (a))"
        )
    # generated referencing generated rejected (PG rule)
    with pytest.raises(ValueError, match="another generated column"):
        sess.sql(
            "CREATE TABLE gen_t (a int, "
            "b int GENERATED ALWAYS AS (a * 2) STORED, "
            "c int GENERATED ALWAYS AS (b + 1) STORED)"
        )
    # unresolvable expression fails at CREATE time
    with pytest.raises(ValueError, match="does not resolve"):
        sess.sql(
            "CREATE TABLE gen_t (a int, "
            "b int GENERATED ALWAYS AS (nope + 1) STORED)"
        )


def test_generated_survives_distribute_and_copy(sess, spark, tmp_path):
    sess.sql(
        "CREATE TABLE gen_t (k int, v int, "
        "tri int GENERATED ALWAYS AS (v * 3) STORED)"
    )
    sess.sql("SELECT create_distributed_table('gen_t', 'k')")
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 7)")
    assert spark.table("gen_t").collect()[0].tri == 21
    # COPY FROM recomputes through the append funnel
    p = tmp_path / "gen.csv"
    p.write_text("2,8,999\n")  # the 999 is overwritten by recompute
    sess.sql(f"COPY gen_t FROM '{p}' WITH (FORMAT csv)")
    rows = {r.k: r.tri for r in spark.table("gen_t").collect()}
    assert rows == {1: 21, 2: 24}


# --- review-finding regressions ---------------------------------------------


def test_on_conflict_recomputes_before_constraints(sess, spark):
    """ON CONFLICT DO UPDATE must judge constraints against the
    RECOMPUTED image (a stale generated value let a violating row
    into storage)."""
    sess.sql(
        "CREATE TABLE gen_t (k int, v int, "
        "dbl int GENERATED ALWAYS AS (v * 2) STORED, CHECK (dbl < 100))"
    )
    sess.sql("ALTER TABLE gen_t ADD CONSTRAINT pk PRIMARY KEY (k)")
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 10)")
    with pytest.raises(ValueError, match="check constraint"):
        sess.sql(
            "INSERT INTO gen_t (k, v) VALUES (1, 60) "
            "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
        )
    # the rejected upsert wrote nothing
    assert spark.table("gen_t").collect()[0].dbl == 20
    # and a legal upsert recomputes
    sess.sql(
        "INSERT INTO gen_t (k, v) VALUES (1, 30) "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
    )
    assert spark.table("gen_t").collect()[0].dbl == 60
    # DO UPDATE targeting the generated column rejects
    with pytest.raises(ValueError, match="only be updated to DEFAULT"):
        sess.sql(
            "INSERT INTO gen_t (k, v) VALUES (1, 5) "
            "ON CONFLICT (k) DO UPDATE SET dbl = 9"
        )


def test_unique_on_generated_column_rechecked(sess, spark):
    """UPDATE of a base column ripples into the generated one — a
    UNIQUE constraint over it must re-judge."""
    sess.sql(
        "CREATE TABLE gen_t (k int, v int, "
        "dbl int GENERATED ALWAYS AS (v * 2) STORED)"
    )
    sess.sql("ALTER TABLE gen_t ADD CONSTRAINT uq UNIQUE (dbl)")
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 10), (2, 15)")
    with pytest.raises(ValueError, match="duplicate key"):
        sess.sql("UPDATE gen_t SET v = 15 WHERE k = 1")


def test_merge_rejects_generated_targets(sess, spark):
    sess.sql(
        "CREATE TABLE gen_t (k int, v int, "
        "dbl int GENERATED ALWAYS AS (v * 2) STORED)"
    )
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 10)")
    spark.sql("SELECT 1 AS k, 9 AS nv").createOrReplaceTempView("gmr_src")
    with pytest.raises(ValueError, match="only be updated to DEFAULT"):
        sess.sql(
            "MERGE INTO gen_t t USING gmr_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET dbl = 999"
        )
    with pytest.raises(ValueError, match="non-DEFAULT value"):
        sess.sql(
            "MERGE INTO gen_t t USING gmr_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, v, dbl) "
            "VALUES (s.k, s.nv, 7)"
        )


def test_insert_generated_with_default_token_allowed(sess, spark):
    """PG allows a generated column in the target list when its value
    is the DEFAULT keyword."""
    sess.sql(
        "CREATE TABLE gen_t (a int, b int GENERATED ALWAYS AS (a * 2) "
        "STORED)"
    )
    sess.sql("INSERT INTO gen_t (a, b) VALUES (4, DEFAULT)")
    assert spark.table("gen_t").collect()[0].b == 8
    with pytest.raises(ValueError, match="non-DEFAULT value"):
        sess.sql("INSERT INTO gen_t (a, b) VALUES (5, DEFAULT), (6, 12)")


def test_default_token_on_identity_draws(sess, spark):
    """DEFAULT aimed at an identity/serial column draws from its
    sequence (was silently NULL)."""
    sess.sql("CREATE TABLE gd_t (id serial, v int)")
    sess.sql("INSERT INTO gd_t (id, v) VALUES (DEFAULT, 1), (DEFAULT, 2)")
    ids = sorted(r.id for r in spark.table("gd_t").collect())
    assert ids == [1, 2]


def test_create_failure_leaves_no_phantom_table(sess, spark):
    with pytest.raises(ValueError, match="does not resolve"):
        sess.sql(
            "CREATE TABLE gen_t (a int, "
            "b int GENERATED ALWAYS AS (nope + 1) STORED)"
        )
    # the corrected retry works — nothing was registered
    sess.sql(
        "CREATE TABLE gen_t (a int, "
        "b int GENERATED ALWAYS AS (a + 1) STORED)"
    )
    sess.sql("INSERT INTO gen_t (a) VALUES (1)")
    assert spark.table("gen_t").collect()[0].b == 2


def test_generated_expr_with_literal_parens_and_self_ref(sess):
    # a paren inside a string literal must not break the scan
    sess.sql(
        "CREATE TABLE gen_t (a text, b text GENERATED ALWAYS AS "
        "(concat(a, ')')) STORED)"
    )
    sess.sql("INSERT INTO gen_t (a) VALUES ('x')")
    assert sess.spark.table("gen_t").collect()[0].b == "x)"
    sess.sql("DROP TABLE gen_t")
    # self-reference rejected (PG 42P17)
    with pytest.raises(ValueError, match="reference itself"):
        sess.sql(
            "CREATE TABLE gen_t (a int, "
            "b int GENERATED ALWAYS AS (b + 1) STORED)"
        )


def test_drop_unrelated_column_with_name_inside_literal(sess):
    """A column name inside a string literal of a generated expression
    must not block DROP of that column."""
    sess.sql(
        "CREATE TABLE gen_t (status text, note text, flag int "
        "GENERATED ALWAYS AS (CASE WHEN status = 'note' THEN 1 "
        "ELSE 0 END) STORED)"
    )
    sess.sql("ALTER TABLE gen_t DROP COLUMN note")  # must succeed
    assert "note" not in sess.spark.table("gen_t").columns


def test_add_column_generated_backfills(sess, spark):
    """ALTER TABLE ADD COLUMN .. GENERATED ALWAYS AS (..) STORED
    computes for existing rows immediately (PG back-fill)."""
    sess.sql("CREATE TABLE gen_t (a int, b int)")
    sess.sql("INSERT INTO gen_t VALUES (1, 10), (2, 20)")
    sess.sql(
        "ALTER TABLE gen_t ADD COLUMN s int "
        "GENERATED ALWAYS AS (a + b) STORED"
    )
    rows = {r.a: r.s for r in spark.table("gen_t").collect()}
    assert rows == {1: 11, 2: 22}
    # later writes keep recomputing
    sess.sql("UPDATE gen_t SET b = 100 WHERE a = 1")
    assert {
        r.a: r.s for r in spark.table("gen_t").collect()
    } == {1: 101, 2: 22}
    # referencing an existing generated column rejects
    with pytest.raises(ValueError, match="another generated column"):
        sess.sql(
            "ALTER TABLE gen_t ADD COLUMN s2 int "
            "GENERATED ALWAYS AS (s * 2) STORED"
        )
    # unresolvable expression rejects without a half-added column
    with pytest.raises(ValueError, match="does not resolve"):
        sess.sql(
            "ALTER TABLE gen_t ADD COLUMN s3 int "
            "GENERATED ALWAYS AS (nope) STORED"
        )
    assert "s3" not in spark.table("gen_t").columns


def test_merge_default_token_and_update_from(sess, spark):
    """Review findings: the DEFAULT keyword works in MERGE INSERT
    VALUES and UPDATE SET (incl. generated columns), and UPDATE..FROM
    enforces the generated-column rules like plain UPDATE."""
    sess.sql(
        "CREATE TABLE gen_t (k int, v int DEFAULT 5, "
        "dbl int GENERATED ALWAYS AS (v * 2) STORED)"
    )
    sess.sql("INSERT INTO gen_t (k, v) VALUES (1, 10)")
    spark.sql("SELECT 2 AS k UNION ALL SELECT 1").createOrReplaceTempView(
        "gdt_src"
    )
    sess.sql(
        "MERGE INTO gen_t t USING gdt_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = DEFAULT, dbl = DEFAULT "
        "WHEN NOT MATCHED THEN INSERT (k, v, dbl) "
        "VALUES (s.k, DEFAULT, DEFAULT)"
    )
    rows = {r.k: (r.v, r.dbl) for r in spark.table("gen_t").collect()}
    assert rows == {1: (5, 10), 2: (5, 10)}
    # UPDATE..FROM: SET col = DEFAULT resolves; generated writes reject
    spark.sql("SELECT 1 AS k, 99 AS nv").createOrReplaceTempView("uf_src")
    sess.sql(
        "UPDATE gen_t SET v = DEFAULT FROM uf_src "
        "WHERE gen_t.k = uf_src.k"
    )
    assert {
        r.k: r.v for r in spark.table("gen_t").collect()
    }[1] == 5
    import pytest as _pt

    with _pt.raises(ValueError, match="only be updated to DEFAULT"):
        sess.sql(
            "UPDATE gen_t SET dbl = uf_src.nv FROM uf_src "
            "WHERE gen_t.k = uf_src.k"
        )


def test_not_null_survives_table_rename(sess, spark):
    for t in ("nnr_t", "nnr_t2"):
        sess.sql(f"DROP TABLE IF EXISTS {t}")
    sess.sql("CREATE TABLE nnr_t (x int)")
    sess.sql("ALTER TABLE nnr_t ALTER COLUMN x SET NOT NULL")
    sess.sql("ALTER TABLE nnr_t RENAME TO nnr_t2")
    # DROP NOT NULL finds the constraint by expression, not name
    sess.sql("ALTER TABLE nnr_t2 ALTER COLUMN x DROP NOT NULL")
    sess.sql("INSERT INTO nnr_t2 VALUES (NULL)")
    assert spark.table("nnr_t2").count() == 1
    sess.sql("DROP TABLE nnr_t2")


def test_set_default_validation_and_identity(sess):
    sess.sql("CREATE TABLE sdv_t (id serial, v int)")
    with pytest.raises(ValueError, match="does not resolve"):
        sess.sql("ALTER TABLE sdv_t ALTER COLUMN v SET DEFAULT 5 ) bogus")
    with pytest.raises(ValueError, match="identity column"):
        sess.sql("ALTER TABLE sdv_t ALTER COLUMN id SET DEFAULT 7")
    sess.sql("DROP TABLE sdv_t")


def test_add_generated_with_not_null_between(sess, spark):
    sess.sql("CREATE TABLE agn_t (a int, b int)")
    sess.sql("INSERT INTO agn_t VALUES (1, 2)")
    sess.sql(
        "ALTER TABLE agn_t ADD COLUMN s int NOT NULL "
        "GENERATED ALWAYS AS (a + b) STORED"
    )
    assert spark.table("agn_t").collect()[0].s == 3
    sess.sql("DROP TABLE agn_t")


def test_insert_default_values(sess, spark):
    """INSERT INTO t DEFAULT VALUES — one all-defaults row (identity
    draws, declared defaults, NULLs, generated recompute)."""
    sess.sql("DROP TABLE IF EXISTS idv_t")
    sess.sql(
        "CREATE TABLE idv_t (id serial, v int DEFAULT 7, note text, "
        "d2 int GENERATED ALWAYS AS (v * 2) STORED)"
    )
    sess.sql("INSERT INTO idv_t DEFAULT VALUES")
    sess.sql("INSERT INTO idv_t DEFAULT VALUES")
    rows = sorted(
        (r.id, r.v, r.note, r.d2)
        for r in spark.table("idv_t").collect()
    )
    assert rows == [(1, 7, None, 14), (2, 7, None, 14)]
    with pytest.raises(ValueError, match="no column list"):
        sess.sql("INSERT INTO idv_t (v) DEFAULT VALUES")
    sess.sql("DROP TABLE idv_t")
