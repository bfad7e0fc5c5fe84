"""Textual MERGE INTO through DistributedSession.sql — the SQL-level
contract the reference exposes (merge_planner.c plans MERGE text; here
plans/merge_sql.py parses it into the merge operator)."""

import pytest
from pyspark.sql import functions as F

from citus_spark.plans.merge_sql import parse_merge
from citus_spark.session import DistributedSession
from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, tmp_path):
    path = str(tmp_path / "orders_t")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").write.parquet(path)
    s = DistributedSession(spark)
    s.catalog.register("orders_t", "hash", "o_orderkey", path=path)
    spark.read.parquet(path).createOrReplaceTempView("orders_t")
    return s


def test_parse_merge_clauses():
    stmt = parse_merge(
        """
        MERGE INTO tgt AS t
        USING (SELECT * FROM src WHERE x > 0) s
        ON t.k1 = s.k1 AND t.k2 = s.k2
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert stmt.target == "tgt"
    assert stmt.source_is_subquery and "WHERE x > 0" in stmt.source
    assert stmt.keys == ["k1", "k2"]
    assert stmt.when_matched == "update" and stmt.insert_unmatched

    d = parse_merge(
        "MERGE INTO tgt USING src ON tgt.k = src.k WHEN MATCHED THEN DELETE"
    )
    assert d.source == "src" and not d.source_is_subquery
    assert d.when_matched == "delete" and not d.insert_unmatched

    with pytest.raises(NotImplementedError):
        parse_merge(
            "MERGE INTO tgt USING src ON tgt.a < src.b "
            "WHEN MATCHED THEN DELETE"
        )


def test_sql_merge_upsert(sess, spark):
    before = spark.table("orders_t")
    n_before = before.count()
    src = (
        before.orderBy("o_orderkey")
        .limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    new_rows = (
        before.orderBy("o_orderkey")
        .limit(5)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    doubled = {r.o_orderkey: r.o_totalprice for r in src.collect()}
    # pin the source — its lineage over the target path dies at overwrite
    spark.createDataFrame(
        src.unionByName(new_rows).collect(), src.schema
    ).createOrReplaceTempView("updates_src")

    out = sess.sql(
        """
        MERGE INTO orders_t AS t USING updates_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert out.count() == n_before + 5
    # the refreshed view shows the merged state to plain SQL
    got = {
        r.o_orderkey: r.o_totalprice
        for r in spark.sql(
            "SELECT o_orderkey, o_totalprice FROM orders_t"
        )
        .filter(F.col("o_orderkey").isin(list(doubled)))
        .collect()
    }
    assert got == pytest.approx(doubled)


def test_sql_merge_delete_with_subquery_source(sess, spark):
    n_before = spark.table("orders_t").count()
    out = sess.sql(
        """
        MERGE INTO orders_t t
        USING (SELECT * FROM orders_t ORDER BY o_orderkey LIMIT 7) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN DELETE
        """
    )
    assert out.count() == n_before - 7


def test_sql_merge_requires_catalog_path(spark):
    s = DistributedSession(spark)
    spark.range(3).createOrReplaceTempView("no_path_t")
    with pytest.raises(ValueError, match="storage path"):
        s.sql(
            "MERGE INTO no_path_t USING no_path_t ON "
            "no_path_t.id = no_path_t.id WHEN MATCHED THEN DELETE"
        )


# ---------------------------------------------------------------------------
# general-form MERGE (assignments / guards / explicit INSERT) — closes
# the grammar gaps previously rejected with NotImplementedError


def test_merge_set_assignments_with_guard(sess, spark):
    """SET col = expr over t./s. references, applied only where the
    WHEN MATCHED AND guard passes; other matched rows untouched."""
    before = {
        r.o_orderkey: (r.o_totalprice, r.o_orderstatus)
        for r in spark.table("orders_t").collect()
    }
    src = (
        spark.table("orders_t").orderBy("o_orderkey").limit(40)
        .select("o_orderkey", (F.col("o_totalprice") + 5).alias("bump"))
    )
    src_keys = {r.o_orderkey for r in src.collect()}
    src.createOrReplaceTempView("price_src")
    sess.sql(
        """
        MERGE INTO orders_t AS t
        USING price_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice > 100000 THEN
          UPDATE SET o_totalprice = s.bump, o_orderstatus = 'M'
        """
    )
    after = {
        r.o_orderkey: (r.o_totalprice, r.o_orderstatus)
        for r in spark.table("orders_t").collect()
    }
    assert len(after) == len(before)
    touched = untouched = 0
    for k, (price, status) in before.items():
        if k in src_keys and price > 100000:
            assert after[k] == (price + 5, "M"), k
            touched += 1
        else:
            assert after[k] == (price, status), k
            untouched += 1
    assert touched > 0 and untouched > 0


def test_merge_explicit_insert_values(sess, spark):
    """INSERT (cols) VALUES (exprs): named columns take the source
    expressions, the rest NULL-fill."""
    n0 = spark.table("orders_t").count()
    spark.createDataFrame(
        [(90_000_001, 777.5), (90_000_002, 888.5)],
        "new_key long, new_price double",
    ).createOrReplaceTempView("fresh_src")
    sess.sql(
        """
        MERGE INTO orders_t AS t
        USING (SELECT new_key AS o_orderkey, new_price FROM fresh_src) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN NOT MATCHED THEN
          INSERT (o_orderkey, o_totalprice, o_orderstatus)
          VALUES (s.o_orderkey, s.new_price * 2, 'N')
        """
    )
    t = spark.table("orders_t")
    assert t.count() == n0 + 2
    row = t.filter("o_orderkey = 90000001").collect()[0]
    assert row.o_totalprice == 1555.0 and row.o_orderstatus == "N"
    assert row.o_custkey is None  # unnamed column NULL-fills


def test_merge_guarded_delete(sess, spark):
    n0 = spark.table("orders_t").count()
    spark.table("orders_t").select("o_orderkey").filter(
        "o_orderkey % 7 = 0"
    ).createOrReplaceTempView("del_src")
    n_match = spark.table("orders_t").filter("o_orderkey % 7 = 0").count()
    n_guard = spark.table("orders_t").filter(
        "o_orderkey % 7 = 0 AND o_totalprice < 50000"
    ).count()
    assert 0 < n_guard < n_match
    sess.sql(
        """
        MERGE INTO orders_t AS t USING del_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice < 50000 THEN DELETE
        """
    )
    assert spark.table("orders_t").count() == n0 - n_guard


def test_parse_merge_multiple_matched_branches():
    stmt = parse_merge(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED AND s.del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    assert stmt.is_multi and not stmt.is_whole_row
    assert stmt.matched_branches == [
        ("s.del", "delete", []),
        (None, "update", []),
    ]


def test_parse_merge_by_source_and_do_nothing():
    stmt = parse_merge(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED AND t.v = s.v THEN DO NOTHING "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.v > 0 THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert stmt.is_multi
    assert stmt.matched_branches[0] == ("t.v = s.v", "nothing", [])
    assert stmt.matched_branches[1] == (None, "update", [("v", "s.v")])
    assert stmt.not_matched_branches == [("s.v > 0", [], [])]
    assert stmt.by_source_branches == [(None, "delete", [])]


def test_parse_merge_unreachable_branch_rejected():
    with pytest.raises(ValueError, match="unreachable"):
        parse_merge(
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN MATCHED AND s.del THEN DELETE"
        )


def test_parse_merge_by_source_insert_rejected():
    with pytest.raises(NotImplementedError, match="BY SOURCE"):
        parse_merge(
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT *"
        )


def test_merge_first_match_wins_ordering(sess, spark):
    """Two guarded UPDATE branches: the FIRST true guard wins, per
    PG's in-order branch evaluation."""
    spark.table("orders_t").select("o_orderkey").filter(
        "o_orderkey <= 100"
    ).createOrReplaceTempView("fm_src")
    sess.sql(
        """
        MERGE INTO orders_t AS t USING fm_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice > 100000 THEN
          UPDATE SET o_orderpriority = 'big'
        WHEN MATCHED AND t.o_totalprice > 0 THEN
          UPDATE SET o_orderpriority = 'small'
        WHEN MATCHED THEN DELETE
        """
    )
    got = spark.table("orders_t").filter("o_orderkey <= 100").collect()
    assert got
    for r in got:
        want = "big" if r.o_totalprice > 100000 else "small"
        assert r.o_orderpriority == want, (r.o_orderkey, r.o_totalprice)


def test_merge_sync_by_source_delete(sess, spark):
    """The PG 17 two-table-sync idiom: upsert matched rows, delete
    target rows missing from the source."""
    n_keep = 40
    spark.table("orders_t").filter(f"o_orderkey <= {n_keep}").select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("newprice")
    ).createOrReplaceTempView("sync_src")
    kept_keys = {
        r.o_orderkey
        for r in spark.table("orders_t")
        .filter(f"o_orderkey <= {n_keep}")
        .select("o_orderkey")
        .collect()
    }
    old_prices = {
        r.o_orderkey: r.o_totalprice
        for r in spark.table("orders_t")
        .filter(f"o_orderkey <= {n_keep}")
        .collect()
    }
    sess.sql(
        """
        MERGE INTO orders_t AS t USING sync_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.newprice
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """
    )
    rows = spark.table("orders_t").collect()
    assert {r.o_orderkey for r in rows} == kept_keys
    for r in rows:
        assert abs(float(r.o_totalprice) - 2 * float(old_prices[r.o_orderkey])) < 1e-6


def test_merge_by_source_guarded_update(sess, spark):
    """BY SOURCE UPDATE touches only unmatched target rows passing the
    guard; matched rows and guard-failing rows stay untouched."""
    spark.table("orders_t").select("o_orderkey").filter(
        "o_orderkey % 2 = 0"
    ).createOrReplaceTempView("bs_src")
    n0 = spark.table("orders_t").count()
    sess.sql(
        """
        MERGE INTO orders_t AS t USING bs_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN NOT MATCHED BY SOURCE AND t.o_totalprice < 50000 THEN
          UPDATE SET o_orderstatus = 'X'
        """
    )
    rows = spark.table("orders_t").collect()
    assert len(rows) == n0
    for r in rows:
        if r.o_orderkey % 2 == 1 and r.o_totalprice < 50000:
            assert r.o_orderstatus == "X"
        else:
            assert r.o_orderstatus != "X"


def test_merge_guarded_insert(sess, spark):
    """WHEN NOT MATCHED AND <guard>: only guard-passing source rows
    insert; the rest are silently skipped (PG semantics)."""
    top = spark.table("orders_t").agg(F.max("o_orderkey")).collect()[0][0]
    spark.range(1, 11).select(
        (F.col("id") + top).alias("o_orderkey")
    ).createOrReplaceTempView("gi_src")
    n0 = spark.table("orders_t").count()
    sess.sql(
        f"""
        MERGE INTO orders_t AS t USING gi_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN NOT MATCHED AND s.o_orderkey <= {top} + 4 THEN
          INSERT (o_orderkey, o_orderstatus) VALUES (s.o_orderkey, 'N')
        """
    )
    rows = spark.table("orders_t").filter(f"o_orderkey > {top}").collect()
    assert len(rows) == 4
    assert spark.table("orders_t").count() == n0 + 4
    assert all(r.o_orderstatus == "N" and r.o_totalprice is None for r in rows)


def test_merge_matched_do_nothing_blocks_later_branch(sess, spark):
    """A winning DO NOTHING branch shields the row from later
    branches — it is NOT a fall-through."""
    spark.table("orders_t").select("o_orderkey").filter(
        "o_orderkey <= 60"
    ).createOrReplaceTempView("dn_src")
    before = {
        r.o_orderkey: r.o_orderstatus
        for r in spark.table("orders_t").filter("o_orderkey <= 60").collect()
    }
    sess.sql(
        """
        MERGE INTO orders_t AS t USING dn_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice > 100000 THEN DO NOTHING
        WHEN MATCHED THEN UPDATE SET o_orderstatus = 'Z'
        """
    )
    got = spark.table("orders_t").filter("o_orderkey <= 60").collect()
    assert got
    for r in got:
        if r.o_totalprice > 100000:
            assert r.o_orderstatus == before[r.o_orderkey]
        else:
            assert r.o_orderstatus == "Z"


def test_merge_multi_returning_action_tags(sess, spark):
    """MERGE RETURNING over a multi-branch statement: each touched row
    carries its branch's action tag; untouched rows absent."""
    top = spark.table("orders_t").agg(F.max("o_orderkey")).collect()[0][0]
    src = spark.table("orders_t").filter("o_orderkey <= 20").select(
        "o_orderkey", F.col("o_totalprice").alias("p")
    ).unionByName(
        spark.range(1, 4).select(
            (F.col("id") + top).alias("o_orderkey"),
            F.lit(1.0).alias("p"),
        )
    )
    src.createOrReplaceTempView("ret_src")
    out = sess.sql(
        """
        MERGE INTO orders_t AS t USING ret_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice > 100000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_orderstatus = 'R'
        WHEN NOT MATCHED THEN INSERT (o_orderkey) VALUES (s.o_orderkey)
        RETURNING merge_action(), o_orderkey, o_orderstatus
        """
    )
    rows = out.collect()
    acts = {r.o_orderkey: r["merge_action"] for r in rows}
    assert sum(1 for a in acts.values() if a == "INSERT") == 3
    assert all(a in ("UPDATE", "DELETE", "INSERT") for a in acts.values())
    upd = [r for r in rows if r["merge_action"] == "UPDATE"]
    assert upd and all(r.o_orderstatus == "R" for r in upd)


def test_merge_case_when_inside_assignment(sess, spark):
    spark.table("orders_t").select("o_orderkey").filter(
        "o_orderkey < 50"
    ).createOrReplaceTempView("case_src")
    sess.sql(
        """
        MERGE INTO orders_t AS t USING case_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET
          o_orderstatus = CASE WHEN t.o_totalprice > 100000
                               THEN 'H' ELSE 'L' END
        """
    )
    got = spark.table("orders_t").filter("o_orderkey < 50").collect()
    assert got and all(r.o_orderstatus in ("H", "L") for r in got)
    for r in got:
        assert r.o_orderstatus == ("H" if r.o_totalprice > 100000 else "L")


def test_merge_swapped_aliases(sess, spark):
    """target AS s / source AS t must not cross-wire references."""
    before = {
        r.o_orderkey: r.o_totalprice
        for r in spark.table("orders_t").filter("o_orderkey < 30").collect()
    }
    spark.createDataFrame(
        [(k, 1000.0) for k in before], "o_orderkey long, newp double"
    ).createOrReplaceTempView("swap_src")
    sess.sql(
        """
        MERGE INTO orders_t AS s USING swap_src AS t
        ON s.o_orderkey = t.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1
        """
    )
    after = {
        r.o_orderkey: r.o_totalprice
        for r in spark.table("orders_t").filter("o_orderkey < 30").collect()
    }
    # s.o_totalprice referenced the TARGET's old value, not the source
    for k, p in before.items():
        assert after[k] == p + 1, k


def test_merge_duplicate_source_keys_rejected(sess, spark):
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "o_orderkey long, x double"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(Exception, match="second time|duplicate"):
        sess.sql(
            """
            MERGE INTO orders_t AS t USING dup_src AS s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND t.o_totalprice > 0 THEN UPDATE SET
              o_totalprice = s.x
            """
        )


def test_merge_bare_table_names_and_positional_insert(spark):
    """PG: unaliased sides are addressable by table name, and INSERT
    VALUES without a column list maps positionally (review: the WHEN
    regex silently DROPPED the list-less form — rows vanished)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for t in ("mb_t", "mb_s"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE mb_t (id bigint, v bigint)")
    s.sql("CREATE TABLE mb_s (id bigint, v bigint)")
    s.sql("INSERT INTO mb_t VALUES (1, 10), (2, 20)")
    s.sql("INSERT INTO mb_s VALUES (2, 99), (3, 30)")
    s.sql(
        "MERGE INTO mb_t USING mb_s ON mb_t.id = mb_s.id "
        "WHEN MATCHED THEN UPDATE SET v = mb_s.v "
        "WHEN NOT MATCHED THEN INSERT VALUES (mb_s.id, mb_s.v)"
    )
    got = sorted(tuple(r) for r in s.sql("SELECT * FROM mb_t").collect())
    assert got == [(1, 10), (2, 99), (3, 30)]


def test_merge_unparseable_when_clause_errors(spark):
    """An unrecognized WHEN action must raise, never silently vanish
    from the statement (review fix)."""
    import pytest as _pytest

    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for t in ("mu_t", "mu_s"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE mu_t (id bigint)")
    s.sql("CREATE TABLE mu_s (id bigint)")
    with _pytest.raises(Exception, match="cannot parse"):
        s.sql(
            "MERGE INTO mu_t USING mu_s ON mu_t.id = mu_s.id "
            "WHEN MATCHED THEN FROBNICATE"
        )


def test_merge_insert_default_values(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for t in ("md_t", "md_s"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE md_t (id bigint DEFAULT 0, tag text DEFAULT 'x')")
    s.sql("CREATE TABLE md_s (id bigint)")
    s.sql("INSERT INTO md_s VALUES (9)")
    s.sql(
        "MERGE INTO md_t USING md_s ON md_t.id = md_s.id "
        "WHEN NOT MATCHED THEN INSERT DEFAULT VALUES"
    )
    assert [tuple(r) for r in s.sql("SELECT * FROM md_t").collect()] == [
        (0, "x")
    ]


def test_merge_literals_not_alias_normalized(spark):
    """String literals containing the bare table name must stay DATA
    (review fix: the bare-name mapping rewrote inside literals)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for t in ("ml_logs", "ml_src"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE ml_logs (id bigint, msg text)")
    s.sql("CREATE TABLE ml_src (id bigint)")
    s.sql("INSERT INTO ml_logs VALUES (1, 'old')")
    s.sql("INSERT INTO ml_src VALUES (1), (2)")
    s.sql(
        "MERGE INTO ml_logs USING ml_src ON ml_logs.id = ml_src.id "
        "WHEN MATCHED THEN UPDATE SET msg = 'from ml_logs.err' "
        "WHEN NOT MATCHED THEN INSERT VALUES (ml_src.id, 'ml_src.raw')"
    )
    got = dict(
        (r[0], r[1]) for r in s.sql("SELECT * FROM ml_logs").collect()
    )
    assert got == {1: "from ml_logs.err", 2: "ml_src.raw"}


def test_merge_positional_skips_generated_columns(spark):
    """PG excludes stored generated columns from the implicit INSERT
    column list (review fix: values silently shifted onto them)."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for t in ("mg_t", "mg_s"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql(
        "CREATE TABLE mg_t (id bigint, "
        "dbl bigint GENERATED ALWAYS AS (id * 2) STORED, tag text)"
    )
    s.sql("CREATE TABLE mg_s (id bigint)")
    s.sql("INSERT INTO mg_s VALUES (5)")
    s.sql(
        "MERGE INTO mg_t USING mg_s ON mg_t.id = mg_s.id "
        "WHEN NOT MATCHED THEN INSERT VALUES (mg_s.id, 'x')"
    )
    assert [tuple(r) for r in s.sql("SELECT * FROM mg_t").collect()] == [
        (5, 10, "x")
    ]


def test_merge_empty_values_rejects():
    import pytest as _pytest

    from citus_spark.plans.merge_sql import parse_merge

    with _pytest.raises(ValueError, match="empty"):
        parse_merge(
            "MERGE INTO t USING s2 ON t.id = s2.id "
            "WHEN NOT MATCHED THEN INSERT VALUES ()"
        )
