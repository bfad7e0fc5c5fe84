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
        "pk_items", "pk_orders", "ex_book", "ex_dist", "ex_uniq",
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
    # PG: DROP COLUMN silently drops SAME-TABLE dependent constraints
    # (CASCADE is only needed for external dependents) — the CHECK
    # goes with its column, the PK goes with its column
    sess.sql("ALTER TABLE ck_t DROP COLUMN price")
    assert "pos" not in sess.catalog.get("ck_t").constraints
    assert "ck_t_pkey" in sess.catalog.get("ck_t").constraints
    sess.sql("ALTER TABLE ck_t ADD COLUMN price int")
    sess.sql("ALTER TABLE ck_t ADD CONSTRAINT pos CHECK (price > 0)")
    sess.sql("ALTER TABLE ck_t DROP COLUMN id")
    assert "ck_t_pkey" not in sess.catalog.get("ck_t").constraints
    sess.sql("ALTER TABLE ck_t ADD COLUMN id int")
    sess.sql("ALTER TABLE ck_t ADD CONSTRAINT ck_t_pkey PRIMARY KEY (id)")
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
    # a column an INBOUND (other-table) FK references still refuses
    sess.sql("CREATE TABLE ck_child (x int REFERENCES ck_t (item_id))")
    with pytest.raises(ValueError, match="depends on it"):
        sess.sql("ALTER TABLE ck_t DROP COLUMN item_id")
    sess.sql("ALTER TABLE ck_child DROP CONSTRAINT ck_child_x_fkey")
    sess.sql("DROP TABLE ck_child")


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


def test_referential_action_codes_stored(sess):
    sess.sql("CREATE TABLE fk_parent (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE fk_child (cid int, pid int)")
    sess.sql(
        "ALTER TABLE fk_child ADD CONSTRAINT c_fk FOREIGN KEY (pid) "
        "REFERENCES fk_parent (pid) ON DELETE CASCADE ON UPDATE SET NULL"
    )
    spec = sess.catalog.get("fk_child").constraints["c_fk"]
    assert (spec["on_delete"], spec["on_update"]) == ("c", "n")
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT c_fk")
    # NO ACTION / RESTRICT spellings record PG's a / r codes
    sess.sql(
        "ALTER TABLE fk_child ADD CONSTRAINT c_fk FOREIGN KEY (pid) "
        "REFERENCES fk_parent (pid) ON DELETE RESTRICT ON UPDATE NO ACTION"
    )
    spec = sess.catalog.get("fk_child").constraints["c_fk"]
    assert (spec["on_delete"], spec["on_update"]) == ("r", "a")
    sess.sql("ALTER TABLE fk_child DROP CONSTRAINT c_fk")


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_on_delete_cascade(sess):
    sess.sql("CREATE TABLE ca_p (pid int PRIMARY KEY, tag text)")
    sess.sql(
        "CREATE TABLE ca_c (cid int, pid int "
        "REFERENCES ca_p (pid) ON DELETE CASCADE)"
    )
    sess.sql("INSERT INTO ca_p VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sess.sql(
        "INSERT INTO ca_c VALUES (10, 1), (11, 1), (20, 2), (90, NULL)"
    )
    out = sess.sql("DELETE FROM ca_p WHERE pid = 1")
    assert out.collect()[0][0] == 1  # tag counts the TARGET's rows only
    assert _rows(sess.spark.table("ca_p"), "pid") == [(2,), (3,)]
    # children of pid=1 cascaded away; the NULL-key row survives
    assert _rows(sess.spark.table("ca_c"), "cid") == [(20,), (90,)]


def test_on_delete_cascade_multilevel(sess):
    sess.sql("CREATE TABLE lv1 (a int PRIMARY KEY)")
    sess.sql(
        "CREATE TABLE lv2 (b int PRIMARY KEY, "
        "a int REFERENCES lv1 (a) ON DELETE CASCADE)"
    )
    sess.sql(
        "CREATE TABLE lv3 (c int, b int "
        "REFERENCES lv2 (b) ON DELETE CASCADE)"
    )
    sess.sql("INSERT INTO lv1 VALUES (1), (2)")
    sess.sql("INSERT INTO lv2 VALUES (10, 1), (20, 2)")
    sess.sql("INSERT INTO lv3 VALUES (100, 10), (200, 20)")
    sess.sql("DELETE FROM lv1 WHERE a = 1")
    assert _rows(sess.spark.table("lv2"), "b") == [(20,)]
    assert _rows(sess.spark.table("lv3"), "c") == [(200,)]


def test_on_delete_set_null_and_default(sess):
    sess.sql("CREATE TABLE sn_p (pid int PRIMARY KEY)")
    sess.sql(
        "CREATE TABLE sn_c (cid int, pid int "
        "REFERENCES sn_p (pid) ON DELETE SET NULL)"
    )
    sess.sql("INSERT INTO sn_p VALUES (1), (2)")
    sess.sql("INSERT INTO sn_c VALUES (10, 1), (20, 2)")
    sess.sql("DELETE FROM sn_p WHERE pid = 1")
    assert _rows(sess.spark.table("sn_c"), "cid", "pid") == [
        (10, None), (20, 2),
    ]
    # SET DEFAULT uses the recorded column DEFAULT — and the default
    # value itself must point at a surviving parent
    sess.sql("CREATE TABLE sd_p (pid int PRIMARY KEY)")
    sess.sql(
        "CREATE TABLE sd_c (cid int, pid int DEFAULT 2 "
        "REFERENCES sd_p (pid) ON DELETE SET DEFAULT)"
    )
    sess.sql("INSERT INTO sd_p VALUES (1), (2)")
    sess.sql("INSERT INTO sd_c VALUES (10, 1)")
    sess.sql("DELETE FROM sd_p WHERE pid = 1")
    assert _rows(sess.spark.table("sd_c"), "cid", "pid") == [(10, 2)]
    # deleting the default's own parent row: the cascaded default
    # write violates the FK against the final state → whole statement
    # fails, nothing is written
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("DELETE FROM sd_p WHERE pid = 2")
    assert _rows(sess.spark.table("sd_c"), "cid", "pid") == [(10, 2)]
    assert _rows(sess.spark.table("sd_p"), "pid") == [(2,)]


def test_self_referential_cascade_fixpoint(sess):
    # org chart: deleting the root cascades through the whole chain —
    # the semi-naive wave loop must converge, not cycle
    sess.sql("CREATE TABLE org (eid int PRIMARY KEY, mgr int)")
    sess.sql(
        "ALTER TABLE org ADD CONSTRAINT org_mgr_fkey FOREIGN KEY (mgr) "
        "REFERENCES org (eid) ON DELETE CASCADE"
    )
    sess.sql(
        "INSERT INTO org VALUES (1, NULL), (2, 1), (3, 2), (4, 3), (5, NULL)"
    )
    sess.sql("DELETE FROM org WHERE eid = 1")
    assert _rows(sess.spark.table("org"), "eid") == [(5,)]


def test_on_update_cascade_and_set_null(sess):
    sess.sql("CREATE TABLE up_p (pid int PRIMARY KEY, tag text)")
    sess.sql(
        "CREATE TABLE up_c (cid int, pid int "
        "REFERENCES up_p (pid) ON UPDATE CASCADE)"
    )
    sess.sql("INSERT INTO up_p VALUES (1, 'a'), (2, 'b')")
    sess.sql("INSERT INTO up_c VALUES (10, 1), (20, 2)")
    sess.sql("UPDATE up_p SET pid = 100 WHERE pid = 1")
    assert _rows(sess.spark.table("up_c"), "cid", "pid") == [
        (10, 100), (20, 2),
    ]
    sess.sql("CREATE TABLE un_p (pid int PRIMARY KEY)")
    sess.sql(
        "CREATE TABLE un_c (cid int, pid int "
        "REFERENCES un_p (pid) ON UPDATE SET NULL)"
    )
    sess.sql("INSERT INTO un_p VALUES (1), (2)")
    sess.sql("INSERT INTO un_c VALUES (10, 1), (20, 2)")
    sess.sql("UPDATE un_p SET pid = 99 WHERE pid = 1")
    assert _rows(sess.spark.table("un_c"), "cid", "pid") == [
        (10, None), (20, 2),
    ]


def test_cascade_write_blocked_by_child_constraints(sess):
    # SET NULL into a PK column of the child → not-null violation,
    # judged BEFORE anything is written
    sess.sql("CREATE TABLE nn_p (pid int PRIMARY KEY)")
    sess.sql(
        "CREATE TABLE nn_c (pid int PRIMARY KEY "
        "REFERENCES nn_p (pid) ON DELETE SET NULL)"
    )
    sess.sql("INSERT INTO nn_p VALUES (1)")
    sess.sql("INSERT INTO nn_c VALUES (1)")
    with pytest.raises(ValueError, match="not-null"):
        sess.sql("DELETE FROM nn_p WHERE pid = 1")
    assert _rows(sess.spark.table("nn_p"), "pid") == [(1,)]
    assert _rows(sess.spark.table("nn_c"), "pid") == [(1,)]


def test_distribution_rules_for_actions(sess):
    # ↔ reference foreign_constraint.c: rewriting the distribution key
    # of a sharded child is rejected at ADD CONSTRAINT time
    sess.sql("CREATE TABLE dr_p (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE dr_c (cid int, pid int)")
    sess.sql("SELECT create_distributed_table('dr_p', 'pid')")
    sess.sql(
        "SELECT create_distributed_table('dr_c', 'pid', "
        "colocate_with => 'dr_p')"
    )
    with pytest.raises(ValueError, match="SET NULL or SET DEFAULT"):
        sess.sql(
            "ALTER TABLE dr_c ADD CONSTRAINT dr_fk FOREIGN KEY (pid) "
            "REFERENCES dr_p (pid) ON DELETE SET NULL"
        )
    with pytest.raises(ValueError, match="ON UPDATE"):
        sess.sql(
            "ALTER TABLE dr_c ADD CONSTRAINT dr_fk FOREIGN KEY (pid) "
            "REFERENCES dr_p (pid) ON UPDATE CASCADE"
        )
    # ON DELETE CASCADE on the distribution key is fine (rows leave,
    # none move shards)
    sess.sql(
        "ALTER TABLE dr_c ADD CONSTRAINT dr_fk FOREIGN KEY (pid) "
        "REFERENCES dr_p (pid) ON DELETE CASCADE"
    )


def test_truncate_fk_cascade(sess):
    sess.sql("CREATE TABLE tr_p (pid int PRIMARY KEY)")
    sess.sql("CREATE TABLE tr_c (cid int, pid int REFERENCES tr_p (pid))")
    sess.sql("INSERT INTO tr_p VALUES (1)")
    sess.sql("INSERT INTO tr_c VALUES (10, 1)")
    with pytest.raises(ValueError, match="TRUNCATE ... CASCADE"):
        sess.sql("TRUNCATE tr_p")
    sess.sql("TRUNCATE tr_p CASCADE")
    assert sess.spark.table("tr_p").count() == 0
    assert sess.spark.table("tr_c").count() == 0


# -- round-7 review regressions


def test_drop_column_name_collision_keeps_fk(sess):
    # c.x merely shares a NAME with p's referenced column — dropping
    # it must NOT detach the FK (refcols name the PARENT's columns)
    sess.sql("CREATE TABLE nc_p (x int PRIMARY KEY)")
    sess.sql("CREATE TABLE nc_c (a int REFERENCES nc_p (x), x int)")
    sess.sql("ALTER TABLE nc_c DROP COLUMN x")
    assert "nc_c_a_fkey" in sess.catalog.get("nc_c").constraints
    sess.sql("INSERT INTO nc_p VALUES (1)")
    with pytest.raises(ValueError, match="violates foreign key"):
        sess.sql("INSERT INTO nc_c VALUES (99)")
    # self-referential FK: dropping the referenced column drops it
    sess.sql("CREATE TABLE nc_s (id int PRIMARY KEY, par int)")
    sess.sql(
        "ALTER TABLE nc_s ADD CONSTRAINT s_fk FOREIGN KEY (par) "
        "REFERENCES nc_s (id)"
    )
    sess.sql("ALTER TABLE nc_s DROP COLUMN par")
    assert "s_fk" not in sess.catalog.get("nc_s").constraints


def test_distribute_rejudges_referential_actions(sess):
    # child → reference-table FK passes the shape rules, so the ACTION
    # rule is what must veto distributing the child on the FK column
    sess.sql("CREATE TABLE rj_p (pid int PRIMARY KEY)")
    sess.sql("SELECT create_reference_table('rj_p')")
    sess.sql(
        "CREATE TABLE rj_c (cid int, pid int "
        "REFERENCES rj_p (pid) ON DELETE SET NULL)"
    )
    # distributing the child on the FK column must hit the same
    # rule ADD CONSTRAINT enforces post-distribution
    with pytest.raises(ValueError, match="SET NULL or SET DEFAULT"):
        sess.sql("SELECT create_distributed_table('rj_c', 'pid')")
    # distributing on a different column is fine
    sess.sql("SELECT create_distributed_table('rj_c', 'cid')")


def test_alter_type_rejects_distribution_column(sess):
    sess.sql("CREATE TABLE adc_t (k int, v int)")
    sess.sql("SELECT create_distributed_table('adc_t', 'k')")
    with pytest.raises(ValueError, match="partition column"):
        sess.sql("ALTER TABLE adc_t ALTER COLUMN k TYPE bigint")
    sess.sql("ALTER TABLE adc_t ALTER COLUMN v TYPE bigint")
    assert dict(sess.spark.table("adc_t").dtypes)["v"] == "bigint"


# ---------------------------------------------------------------------------
# EXCLUDE constraints (↔ reference commands/table.c:3430 distribution
# rule; PG exclusion semantics: no two rows satisfy every element's
# operator pairwise — the booking/no-overlap idiom)


def test_exclude_lifecycle_overlap(sess, spark):
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    sess.sql(
        "INSERT INTO ex_book VALUES (1, array(1, 2)), (1, array(3, 4)), "
        "(2, array(1, 2))"
    )
    sess.sql(
        "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE USING gist (room WITH =, slots WITH &&)"
    )
    # same room, overlapping slots → conflict
    with pytest.raises(ValueError, match='exclusion constraint "no_dbl"'):
        sess.sql("INSERT INTO ex_book VALUES (1, array(2, 9))")
    # same room, disjoint slots → fine; other room, same slots → fine
    sess.sql("INSERT INTO ex_book VALUES (1, array(5)), (2, array(3, 4))")
    assert spark.table("ex_book").count() == 5


def test_exclude_existing_violation_and_not_valid(sess, spark):
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    sess.sql(
        "INSERT INTO ex_book VALUES (1, array(1, 2)), (1, array(2, 3))"
    )
    with pytest.raises(ValueError, match="could not create exclusion"):
        sess.sql(
            "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
            "EXCLUDE (room WITH =, slots WITH &&)"
        )
    sess.sql(
        "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE (room WITH =, slots WITH &&) NOT VALID"
    )
    # enforced for NEW writes even while NOT VALID
    with pytest.raises(ValueError, match='exclusion constraint "no_dbl"'):
        sess.sql("INSERT INTO ex_book VALUES (1, array(3, 8))")
    with pytest.raises(ValueError, match="could not validate"):
        sess.sql("ALTER TABLE ex_book VALIDATE CONSTRAINT no_dbl")
    sess.sql("DELETE FROM ex_book WHERE slots = array(2, 3)")
    sess.sql("ALTER TABLE ex_book VALIDATE CONSTRAINT no_dbl")


def test_exclude_distribution_rule(sess, spark):
    sess.sql("CREATE TABLE ex_dist (room int, slots int[])")
    sess.sql("SELECT create_distributed_table('ex_dist', 'room')")
    # dist col absent from the equality elements → rejected
    with pytest.raises(ValueError, match="partition column"):
        sess.sql(
            "ALTER TABLE ex_dist ADD CONSTRAINT bad "
            "EXCLUDE (slots WITH &&)"
        )
    sess.sql(
        "ALTER TABLE ex_dist ADD CONSTRAINT ok "
        "EXCLUDE (room WITH =, slots WITH &&)"
    )
    with pytest.raises(ValueError, match='exclusion constraint "ok"'):
        sess.sql(
            "INSERT INTO ex_dist VALUES (5, array(1)), (5, array(1, 7))"
        )


def test_exclude_update_path_and_nulls(sess, spark):
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    sess.sql(
        "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE (room WITH =, slots WITH &&)"
    )
    sess.sql(
        "INSERT INTO ex_book VALUES (1, array(1)), (1, array(2)), "
        "(2, array(1))"
    )
    # UPDATE that creates an overlap is rejected
    with pytest.raises(ValueError, match='exclusion constraint "no_dbl"'):
        sess.sql("UPDATE ex_book SET slots = array(1, 5) WHERE room = 1 "
                 "AND slots = array(2)")
    # NULL room and empty/NULL arrays are inert (never conflict)
    sess.sql(
        "INSERT INTO ex_book VALUES (NULL, array(1)), (NULL, array(1)), "
        "(3, array()), (3, array()), (4, NULL), (4, NULL)"
    )
    assert spark.table("ex_book").count() == 9


def test_exclude_equality_only_and_inline(sess, spark):
    # '='-only EXCLUDE ≡ UNIQUE (PG docs say exactly this); inline
    # table-level spelling in CREATE TABLE parses into the same op
    sess.sql(
        "CREATE TABLE ex_uniq (id int, v int, "
        "CONSTRAINT one_per_id EXCLUDE (id WITH =))"
    )
    sess.sql("INSERT INTO ex_uniq VALUES (1, 10), (2, 20)")
    with pytest.raises(ValueError, match='exclusion constraint "one_per_id"'):
        sess.sql("INSERT INTO ex_uniq VALUES (1, 99)")
    # pg_constraint reflects contype 'x'
    row = sess.sql(
        "SELECT contype, conkey FROM pg_constraint "
        "WHERE conname = 'one_per_id'"
    ).collect()[0]
    assert row.contype == "x" and row.conkey == "id"


def test_exclude_bad_shapes_rejected(sess, spark):
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    # && on a non-array column
    with pytest.raises(ValueError, match="requires an array column"):
        sess.sql(
            "ALTER TABLE ex_book ADD CONSTRAINT bad "
            "EXCLUDE (room WITH &&)"
        )
    # unsupported operator
    with pytest.raises(NotImplementedError, match="EXCLUDE elements"):
        sess.sql(
            "ALTER TABLE ex_book ADD CONSTRAINT bad "
            "EXCLUDE (room WITH <>)"
        )


def test_exclude_dropped_with_column(sess, spark):
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    sess.sql(
        "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE (room WITH =, slots WITH &&)"
    )
    sess.sql("ALTER TABLE ex_book DROP COLUMN slots")
    # constraint auto-dropped with its column (PG same-table rule)
    assert "no_dbl" not in (sess.catalog.get("ex_book").constraints or {})


def test_exclude_not_valid_allows_unrelated_writes(sess, spark):
    """Review finding: pre-existing conflicts under NOT VALID must not
    block writes that conflict with nothing (PG checks each written
    row against the table, not the whole table against itself)."""
    sess.sql("CREATE TABLE ex_book (room int, slots int[])")
    sess.sql(
        "INSERT INTO ex_book VALUES (1, array(1, 2)), (1, array(2, 3))"
    )
    sess.sql(
        "ALTER TABLE ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE (room WITH =, slots WITH &&) NOT VALID"
    )
    # conflicts with nothing → accepted despite the old bad pair
    sess.sql("INSERT INTO ex_book VALUES (99, array(50))")
    assert spark.table("ex_book").count() == 3
    # conflicts with an existing row → still rejected
    with pytest.raises(ValueError, match='exclusion constraint "no_dbl"'):
        sess.sql("INSERT INTO ex_book VALUES (1, array(3, 8))")
    # UPDATE of an unrelated row also passes
    sess.sql("UPDATE ex_book SET slots = array(60) WHERE room = 99")


def test_exclude_rejudged_at_distribute_time(sess, spark):
    """Review finding: distributing a table re-judges EXCLUDE like
    PK/UNIQUE — an EXCLUDE without dist-col equality must veto
    create_distributed_table (reference table.c:3430)."""
    sess.sql("CREATE TABLE ex_dist (room int, slots int[])")
    sess.sql(
        "ALTER TABLE ex_dist ADD CONSTRAINT ov EXCLUDE (slots WITH &&)"
    )
    with pytest.raises(ValueError, match="partition column"):
        sess.sql("SELECT create_distributed_table('ex_dist', 'room')")
    # the failed distribute left the local table + constraint intact
    assert "ov" in (sess.catalog.get("ex_dist").constraints or {})
    with pytest.raises(ValueError, match='exclusion constraint "ov"'):
        sess.sql(
            "INSERT INTO ex_dist VALUES (1, array(5)), (2, array(5, 6))"
        )


def test_exclude_revalidated_on_alter_column_type(sess, spark):
    """Review finding: a narrowing type change can merge distinct
    keys into a conflict — ALTER COLUMN TYPE must re-judge EXCLUDE."""
    sess.sql("CREATE TABLE ex_uniq (id double precision, v int)")
    sess.sql("INSERT INTO ex_uniq VALUES (1.2, 1), (1.4, 2)")
    sess.sql(
        "ALTER TABLE ex_uniq ADD CONSTRAINT one EXCLUDE (id WITH =)"
    )
    with pytest.raises(ValueError, match='exclusion constraint "one"'):
        sess.sql("ALTER TABLE ex_uniq ALTER COLUMN id TYPE int")
    # the failed ALTER left the data untouched
    assert dict(sess.spark.table("ex_uniq").dtypes)["id"] == "double"


def test_update_from_with_on_update_cascade(sess, spark):
    """UPDATE .. FROM rekeying a parent ripples ON UPDATE CASCADE into
    children (previously rejected — the FROM form now derives the
    old/new remap)."""
    for t in ("ufc_child", "ufc_parent", "ufc_map"):
        sess.sql(f"DROP TABLE IF EXISTS {t}")
    sess.sql("CREATE TABLE ufc_parent (pk int PRIMARY KEY, tag text)")
    sess.sql(
        "CREATE TABLE ufc_child (pk int REFERENCES ufc_parent (pk) "
        "ON UPDATE CASCADE, v int)"
    )
    sess.sql("CREATE TABLE ufc_map (old_k int, new_k int)")
    sess.sql("INSERT INTO ufc_parent VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sess.sql("INSERT INTO ufc_child VALUES (1, 10), (1, 11), (2, 20)")
    sess.sql("INSERT INTO ufc_map VALUES (1, 100), (2, 200)")
    sess.sql(
        "UPDATE ufc_parent SET pk = ufc_map.new_k FROM ufc_map "
        "WHERE ufc_parent.pk = ufc_map.old_k"
    )
    parents = sorted(r.pk for r in spark.table("ufc_parent").collect())
    assert parents == [3, 100, 200]
    kids = sorted(
        (r.pk, r.v) for r in spark.table("ufc_child").collect()
    )
    assert kids == [(100, 10), (100, 11), (200, 20)]
    for t in ("ufc_child", "ufc_parent", "ufc_map"):
        sess.sql(f"DROP TABLE IF EXISTS {t}")
