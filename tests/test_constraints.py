"""Table constraints (plans/constraints.py ↔ reference
foreign_constraint.c + multi_alter_table_statements / multi_foreign_key
regress): distribution rules at DDL time, distributed validation of
existing rows, and PG-shaped write-path enforcement."""

import pytest

from citus_spark.session import DistributedSession


@pytest.fixture()
def sess(spark):
    s = DistributedSession(spark)
    yield s
    for t in (
        "fk_child", "fk_parent", "fk_ref", "uq_t", "ck_t", "loc_t",
        "pk_items", "pk_orders",
    ):
        try:
            s.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass


def test_check_constraint_lifecycle(sess, spark):
    sess.sql("CREATE TABLE ck_t (id int, price int)")
    sess.sql("INSERT INTO ck_t VALUES (1, 10), (2, -5)")
    # existing violation blocks a plain ADD
    with pytest.raises(ValueError, match="violated by some row"):
        sess.sql("ALTER TABLE ck_t ADD CONSTRAINT pos CHECK (price > 0)")
    # NOT VALID defers the scan...
    sess.sql(
        "ALTER TABLE ck_t ADD CONSTRAINT pos CHECK (price > 0) NOT VALID"
    )
    # ...but still rejects new rows
    with pytest.raises(ValueError, match='violates check constraint "pos"'):
        sess.sql("INSERT INTO ck_t VALUES (3, -1)")
    # VALIDATE sees the old bad row
    with pytest.raises(ValueError, match="violated by some row"):
        sess.sql("ALTER TABLE ck_t VALIDATE CONSTRAINT pos")
    sess.sql("DELETE FROM ck_t WHERE price < 0")
    sess.sql("ALTER TABLE ck_t VALIDATE CONSTRAINT pos")
    # NULL check result passes (3-valued logic, PG semantics)
    sess.sql("INSERT INTO ck_t VALUES (4, NULL)")
    # UPDATE re-judges the new image
    with pytest.raises(ValueError, match='violates check constraint "pos"'):
        sess.sql("UPDATE ck_t SET price = -10 WHERE id = 1")
    sess.sql("ALTER TABLE ck_t DROP CONSTRAINT pos")
    sess.sql("INSERT INTO ck_t VALUES (5, -99)")  # constraint gone


def test_unique_and_pk(sess, spark):
    sess.sql("CREATE TABLE uq_t (id int, sku text)")
    sess.sql("INSERT INTO uq_t VALUES (1, 'a'), (2, 'b'), (2, 'c')")
    with pytest.raises(ValueError, match="could not create unique index"):
        sess.sql("ALTER TABLE uq_t ADD CONSTRAINT uq_id UNIQUE (id)")
    sess.sql("ALTER TABLE uq_t ADD CONSTRAINT uq_sku UNIQUE (sku)")
    with pytest.raises(ValueError, match="duplicate key value"):
        sess.sql("INSERT INTO uq_t VALUES (9, 'a')")
    # NULLs never conflict (PG NULLS DISTINCT default)
    sess.sql("INSERT INTO uq_t VALUES (10, NULL), (11, NULL)")
    # UPDATE that collides two keys is caught post-image
    with pytest.raises(ValueError, match="duplicate key value"):
        sess.sql("UPDATE uq_t SET sku = 'b' WHERE sku = 'a'")
    # PK rejects NULL key values at ADD time
    with pytest.raises(ValueError, match="contains null values"):
        sess.sql("ALTER TABLE uq_t ADD CONSTRAINT pk PRIMARY KEY (sku)")


def test_fk_lifecycle_and_restrict(sess, spark):
    sess.sql("CREATE TABLE fk_parent (pid int PRIMARY KEY, label text)")
    sess.sql("CREATE TABLE fk_child (cid int, pid int)")
    sess.sql("INSERT INTO fk_parent VALUES (1, 'x'), (2, 'y')")
    sess.sql("INSERT INTO fk_child VALUES (10, 1), (11, 7)")
    # orphan row blocks the plain ADD
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql(
            "ALTER TABLE fk_child ADD CONSTRAINT c_fk "
            "FOREIGN KEY (pid) REFERENCES fk_parent (pid)"
        )
    sess.sql("DELETE FROM fk_child WHERE pid = 7")
    sess.sql(
        "ALTER TABLE fk_child ADD CONSTRAINT c_fk "
        "FOREIGN KEY (pid) REFERENCES fk_parent (pid)"
    )
    # INSERT of an orphan is rejected; NULL FK passes (MATCH SIMPLE)
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("INSERT INTO fk_child VALUES (12, 99)")
    sess.sql("INSERT INTO fk_child VALUES (13, NULL)")
    # DELETE of a referenced parent row is RESTRICTed
    with pytest.raises(ValueError, match="on table \"fk_child\""):
        sess.sql("DELETE FROM fk_parent WHERE pid = 1")
    sess.sql("DELETE FROM fk_parent WHERE pid = 2")  # unreferenced: fine
    # UPDATE of the referenced key is RESTRICTed too
    sess.sql("INSERT INTO fk_parent VALUES (2, 'y2')")
    with pytest.raises(ValueError, match="on table \"fk_child\""):
        sess.sql("UPDATE fk_parent SET pid = 5 WHERE pid = 1")
    # DROP TABLE of the parent is blocked while the FK exists
    with pytest.raises(ValueError, match="depend on it"):
        sess.sql("DROP TABLE fk_parent")
    # the PK the FK points at cannot be dropped either
    with pytest.raises(ValueError, match="depends on it"):
        sess.sql("ALTER TABLE fk_parent DROP CONSTRAINT fk_parent_pkey")
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT c_fk")
    sess.sql("DROP TABLE fk_parent")


def test_fk_requires_unique_on_parent(sess):
    sess.sql("CREATE TABLE fk_parent (pid int, label text)")
    sess.sql("CREATE TABLE fk_child (cid int, pid int)")
    with pytest.raises(ValueError, match="no unique constraint matching"):
        sess.sql(
            "ALTER TABLE fk_child ADD CONSTRAINT c_fk "
            "FOREIGN KEY (pid) REFERENCES fk_parent (pid)"
        )
    # omitted column list resolves the parent PK once one exists
    sess.sql("ALTER TABLE fk_parent ADD CONSTRAINT p_pk PRIMARY KEY (pid)")
    sess.sql(
        "ALTER TABLE fk_child ADD CONSTRAINT c_fk "
        "FOREIGN KEY (pid) REFERENCES fk_parent"
    )
    spec = sess.catalog.get("fk_child").constraints["c_fk"]
    assert spec["refcols"] == ["pid"]
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT c_fk")


def test_distribution_rules(sess, spark):
    sess.sql("CREATE TABLE pk_orders (oid bigint, uid bigint)")
    sess.sql("INSERT INTO pk_orders VALUES (1, 100), (2, 101)")
    sess.create_distributed_table(
        "pk_orders", spark.table("pk_orders"), "uid"
    )
    # unique key not covering the distribution column → reference error
    with pytest.raises(ValueError, match="include the partition column"):
        sess.sql(
            "ALTER TABLE pk_orders ADD CONSTRAINT o_pk PRIMARY KEY (oid)"
        )
    sess.sql(
        "ALTER TABLE pk_orders ADD CONSTRAINT o_pk PRIMARY KEY (uid, oid)"
    )
    # FK from a local table to a distributed one is unsupported
    sess.sql("CREATE TABLE loc_t (uid bigint, oid bigint)")
    with pytest.raises(ValueError, match="not supported"):
        sess.sql(
            "ALTER TABLE loc_t ADD CONSTRAINT l_fk FOREIGN KEY "
            "(uid, oid) REFERENCES pk_orders (uid, oid)"
        )
    # distributed → reference table is always legal
    sess.sql("CREATE TABLE fk_ref (uid bigint, segment text)")
    sess.sql("INSERT INTO fk_ref VALUES (100, 's'), (101, 't')")
    sess.sql("ALTER TABLE fk_ref ADD CONSTRAINT r_pk PRIMARY KEY (uid)")
    sess.create_reference_table("fk_ref", spark.table("fk_ref"))
    sess.sql(
        "ALTER TABLE pk_orders ADD CONSTRAINT o_ref_fk FOREIGN KEY (uid) "
        "REFERENCES fk_ref (uid)"
    )
    # distributed → distributed needs colocation + same ordinal
    sess.sql("CREATE TABLE pk_items (oid bigint, uid bigint, qty int)")
    sess.create_distributed_table(
        "pk_items", spark.table("pk_items"), "uid", colocate_with="pk_orders"
    )
    sess.sql(
        "ALTER TABLE pk_items ADD CONSTRAINT i_fk FOREIGN KEY (uid, oid) "
        "REFERENCES pk_orders (uid, oid)"
    )
    # ...but the distribution column at a DIFFERENT ordinal errors
    # (the key columns exist and match the parent PK as a set, so PG
    # itself would accept this — the rejection is purely Citus's)
    with pytest.raises(ValueError, match="cannot create foreign key"):
        sess.sql(
            "ALTER TABLE pk_items ADD CONSTRAINT bad_fk "
            "FOREIGN KEY (oid, uid) REFERENCES pk_orders (uid, oid)"
        )
    sess.sql("ALTER TABLE pk_items DROP CONSTRAINT i_fk")
    sess.sql("ALTER TABLE pk_orders DROP CONSTRAINT o_ref_fk")


def test_distribute_rechecks_existing_constraints(sess, spark):
    sess.sql("CREATE TABLE uq_t (id int PRIMARY KEY, grp int)")
    sess.sql("INSERT INTO uq_t VALUES (1, 7), (2, 7)")
    # distributing by a column the PK does not cover must fail and
    # leave the local table intact
    with pytest.raises(ValueError, match="include the partition column"):
        sess.create_distributed_table("uq_t", spark.table("uq_t"), "grp")
    entry = sess.catalog.get("uq_t")
    assert not entry.is_hash_distributed
    assert "uq_t_pkey" in entry.constraints
    # distributing by the PK column itself is fine
    sess.create_distributed_table("uq_t", spark.table("uq_t"), "id")
    assert sess.catalog.get("uq_t").is_hash_distributed
    assert "uq_t_pkey" in sess.catalog.get("uq_t").constraints


def test_create_table_inline_constraints(sess, spark):
    sess.sql(
        """
        CREATE TABLE fk_parent (
          pid int PRIMARY KEY,
          code text UNIQUE,
          score int CHECK (score >= 0)
        )
        """
    )
    cons = sess.catalog.get("fk_parent").constraints
    assert cons["fk_parent_pkey"]["kind"] == "p"
    assert cons["fk_parent_code_key"]["kind"] == "u"
    assert cons["fk_parent_score_check"]["kind"] == "c"
    sess.sql("INSERT INTO fk_parent VALUES (1, 'a', 5)")
    with pytest.raises(ValueError, match="duplicate key value"):
        sess.sql("INSERT INTO fk_parent VALUES (1, 'b', 5)")
    with pytest.raises(ValueError, match="violates check constraint"):
        sess.sql("INSERT INTO fk_parent VALUES (2, 'b', -1)")
    # table-level constraints: composite FK at CREATE time
    sess.sql(
        """
        CREATE TABLE fk_child (
          cid int,
          pid int,
          CONSTRAINT child_fk FOREIGN KEY (pid) REFERENCES fk_parent (pid)
        )
        """
    )
    assert (
        sess.catalog.get("fk_child").constraints["child_fk"]["refcols"]
        == ["pid"]
    )
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("INSERT INTO fk_child VALUES (1, 42)")
    sess.sql("INSERT INTO fk_child VALUES (1, 1)")
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT child_fk")


def test_column_change_guards(sess):
    sess.sql("CREATE TABLE ck_t (id int PRIMARY KEY, price int)")
    sess.sql("ALTER TABLE ck_t ADD CONSTRAINT pos CHECK (price > 0)")
    with pytest.raises(ValueError, match="depends on it"):
        sess.sql("ALTER TABLE ck_t DROP COLUMN id")
    with pytest.raises(ValueError, match="depends on it"):
        sess.sql("ALTER TABLE ck_t DROP COLUMN price")
    # renaming a key column propagates into the stored column list
    sess.sql("ALTER TABLE ck_t RENAME COLUMN id TO item_id")
    assert sess.catalog.get("ck_t").constraints["ck_t_pkey"]["cols"] == [
        "item_id"
    ]
    # renaming a column inside a textual CHECK expression is rejected
    with pytest.raises(ValueError, match="references it textually"):
        sess.sql("ALTER TABLE ck_t RENAME COLUMN price TO cost")
    sess.sql("ALTER TABLE ck_t DROP CONSTRAINT pos")
    sess.sql("ALTER TABLE ck_t RENAME COLUMN price TO cost")


def test_rename_table_keeps_inbound_fks(sess, spark):
    sess.sql("CREATE TABLE fk_parent (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE fk_child (cid int, "
             "pid int REFERENCES fk_parent (pid))")
    sess.sql("INSERT INTO fk_parent VALUES (1)")
    sess.sql("INSERT INTO fk_child VALUES (10, 1)")
    sess.sql("ALTER TABLE fk_parent RENAME TO fk_parent2")
    # the FK followed the rename: orphan insert still rejected,
    # referenced delete still RESTRICTed, drop still blocked
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("INSERT INTO fk_child VALUES (11, 99)")
    with pytest.raises(ValueError, match='on table "fk_child"'):
        sess.sql("DELETE FROM fk_parent2 WHERE pid = 1")
    with pytest.raises(ValueError, match="depend on it"):
        sess.sql("DROP TABLE fk_parent2")
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT fk_child_pid_fkey")
    sess.sql("DROP TABLE fk_parent2")


def test_self_referential_fk(sess, spark):
    sess.sql(
        "CREATE TABLE ck_t (id int PRIMARY KEY, "
        "parent_id int REFERENCES ck_t (id))"
    )
    # a row may reference a sibling inserted by the SAME statement
    # (PG checks end-of-statement state)
    sess.sql("INSERT INTO ck_t VALUES (1, NULL), (2, 1)")
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("INSERT INTO ck_t VALUES (3, 42)")
    # deleting a referenced parent alone is RESTRICTed...
    with pytest.raises(ValueError, match='on table "ck_t"'):
        sess.sql("DELETE FROM ck_t WHERE id = 1")
    # ...but parent and child may leave together (end-of-statement)
    sess.sql("DELETE FROM ck_t WHERE id IN (1, 2)")
    assert spark.table("ck_t").count() == 0
    # a self-referencing table drops without ceremony (PG does too)
    sess.sql("DROP TABLE ck_t")


def test_on_conflict_enforces_other_constraints(sess, spark):
    sess.sql("CREATE TABLE uq_t (id int PRIMARY KEY, sku text UNIQUE, "
             "qty int CHECK (qty >= 0))")
    sess.sql("INSERT INTO uq_t VALUES (1, 'a', 5)")
    # arbiter = (id): resolved by DO NOTHING
    sess.sql("INSERT INTO uq_t VALUES (1, 'zz', 7) "
             "ON CONFLICT (id) DO NOTHING")
    # but a NON-arbiter unique key still raises (PG arbitrates only
    # on the conflict target)
    with pytest.raises(ValueError, match="duplicate key value"):
        sess.sql("INSERT INTO uq_t VALUES (9, 'a', 1) "
                 "ON CONFLICT (id) DO NOTHING")
    # and a DO UPDATE assignment that breaks CHECK is rejected
    with pytest.raises(ValueError, match="violates check constraint"):
        sess.sql(
            "INSERT INTO uq_t VALUES (1, 'a', 1) ON CONFLICT (id) "
            "DO UPDATE SET qty = uq_t.qty - 100"
        )
    assert spark.table("uq_t").count() == 1


def test_update_pk_to_null_rejected(sess):
    sess.sql("CREATE TABLE uq_t (id int PRIMARY KEY, v int)")
    sess.sql("INSERT INTO uq_t VALUES (1, 10), (2, 20)")
    with pytest.raises(ValueError, match="not-null constraint"):
        sess.sql("UPDATE uq_t SET id = NULL WHERE v = 10")


def test_create_table_rollback_on_bad_constraint(sess, spark):
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("CREATE TABLE ck_t (id bigint REFERENCES nowhere (id))")
    # nothing half-created: the corrected retry succeeds
    assert sess.catalog.get("ck_t") is None
    sess.sql("CREATE TABLE ck_t (id bigint PRIMARY KEY)")
    assert "ck_t_pkey" in sess.catalog.get("ck_t").constraints


def test_fk_unknown_child_column_errors_at_add(sess):
    sess.sql("CREATE TABLE fk_parent (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE fk_child (cid int, pid int)")
    with pytest.raises(ValueError, match='column "typo_col" referenced'):
        sess.sql(
            "ALTER TABLE fk_child ADD CONSTRAINT bad FOREIGN KEY "
            "(typo_col) REFERENCES fk_parent (pid)"
        )
    with pytest.raises(ValueError, match="does not resolve"):
        sess.sql(
            "ALTER TABLE fk_child ADD CONSTRAINT bad2 "
            "CHECK (no_such_col > 0) NOT VALID"
        )


def test_copy_and_merge_enforce_constraints(sess, spark, tmp_path):
    sess.sql("CREATE TABLE ck_t (id int PRIMARY KEY, qty int "
             "CHECK (qty >= 0))")
    sess.sql("INSERT INTO ck_t VALUES (1, 5)")
    bad = tmp_path / "bad.csv"
    bad.write_text("id,qty\n2,7\n3,-4\n")
    with pytest.raises(ValueError, match="violates check constraint"):
        sess.sql(f"COPY ck_t FROM '{bad}' WITH (FORMAT csv, HEADER true)")
    dup = tmp_path / "dup.csv"
    dup.write_text("id,qty\n1,7\n")
    with pytest.raises(ValueError, match="duplicate key value"):
        sess.sql(f"COPY ck_t FROM '{dup}' WITH (FORMAT csv, HEADER true)")
    good = tmp_path / "good.csv"
    good.write_text("id,qty\n2,7\n")
    sess.sql(f"COPY ck_t FROM '{good}' WITH (FORMAT csv, HEADER true)")
    assert spark.table("ck_t").count() == 2
    # MERGE general form: a matched UPDATE that breaks CHECK raises
    sess.sql("CREATE TABLE loc_t (id int, delta int)")
    sess.sql("INSERT INTO loc_t VALUES (1, -100)")
    with pytest.raises(ValueError, match="violates check constraint"):
        sess.sql(
            "MERGE INTO ck_t AS t USING loc_t AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET qty = t.qty + s.delta"
        )


def test_referential_action_rejected(sess):
    sess.sql("CREATE TABLE fk_parent (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE fk_child (cid int, pid int)")
    with pytest.raises(NotImplementedError, match="CASCADE"):
        sess.sql(
            "ALTER TABLE fk_child ADD CONSTRAINT c_fk FOREIGN KEY (pid) "
            "REFERENCES fk_parent (pid) ON DELETE CASCADE"
        )
    # NO ACTION / RESTRICT spellings are accepted
    sess.sql(
        "ALTER TABLE fk_child ADD CONSTRAINT c_fk FOREIGN KEY (pid) "
        "REFERENCES fk_parent (pid) ON DELETE RESTRICT ON UPDATE NO ACTION"
    )
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT c_fk")
