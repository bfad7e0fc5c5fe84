"""DDL/DML surface oracle entries — referential-action cascades,
join-DML (UPDATE..FROM / DELETE..USING), ALTER COLUMN TYPE, TRUNCATE
CASCADE, restore points, shard placements.

↔ reference:
- commands/foreign_constraint.c (referential actions — executed by PG
  in the reference, by plans/constraints.py's cascade engine here)
- the modify planner's join-DML routing (UPDATE .. FROM / DELETE ..
  USING, plans/dml_sql.py)
- commands/alter_table.c (ALTER COLUMN TYPE)
- commands/truncate.c (TRUNCATE ... CASCADE propagation)
- operations/citus_create_restore_point.c (named restore points,
  sources/txlog.py TxCluster)
- shard placements / rebalancer metadata (citus_spark/cluster.py)

Every entry builds scratch tables from the fixture data, runs the
statement surface, and returns a final state DuckDB re-derives
value-exactly from the same fixture — the ORACLE runs none of the
DDL/DML, it computes what the end state must equal.
"""

from __future__ import annotations

from citus_spark.queries import register_split


def _sess(spark, sf_dir):
    from citus_spark.session import register_views

    return register_views(spark, sf_dir)


# --- ON DELETE CASCADE: the archive-cascade idiom ---------------------------
# Parent/child built from orders/lineitem; deleting low-priority
# parents cascades their items away. The oracle re-derives the
# surviving child aggregate from the join — every cascaded row
# accounted for, value-exact.
def fk_cascade_archive(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__fkc_items", "__fkc_orders"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE __fkc_orders (okey bigint PRIMARY KEY, prio text)")
    s.sql(
        "CREATE TABLE __fkc_items (okey bigint REFERENCES __fkc_orders "
        "(okey) ON DELETE CASCADE, qty double)"
    )
    s.sql(
        "INSERT INTO __fkc_orders SELECT o_orderkey, o_orderpriority "
        "FROM orders WHERE o_orderkey < 2000"
    )
    s.sql(
        "INSERT INTO __fkc_items SELECT l_orderkey, l_quantity "
        "FROM lineitem WHERE l_orderkey < 2000"
    )
    s.sql("DELETE FROM __fkc_orders WHERE prio = '5-LOW'")
    return s.sql(
        """
SELECT count(*) AS n_items,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       (SELECT count(*) FROM __fkc_orders) AS n_orders
FROM __fkc_items
"""
    )


register_split(
    "fk_cascade_archive",
    fk_cascade_archive,
    """
SELECT (SELECT count(*) FROM lineitem l JOIN orders o
        ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey < 2000 AND o.o_orderpriority <> '5-LOW')
       AS n_items,
       (SELECT CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey < 2000 AND o.o_orderpriority <> '5-LOW')
       AS total_qty,
       (SELECT count(*) FROM orders
        WHERE o_orderkey < 2000 AND o_orderpriority <> '5-LOW')
       AS n_orders
""",
)


# --- ON DELETE SET NULL: orphaned keys nulled, rows kept ---------------------
def fk_set_null_orphans(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__fkn_child", "__fkn_parent"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE __fkn_parent (ckey bigint PRIMARY KEY)")
    s.sql(
        "CREATE TABLE __fkn_child (okey bigint, ckey bigint REFERENCES "
        "__fkn_parent (ckey) ON DELETE SET NULL)"
    )
    s.sql(
        "INSERT INTO __fkn_parent SELECT DISTINCT c_custkey "
        "FROM customer WHERE c_custkey < 400"
    )
    s.sql(
        "INSERT INTO __fkn_child SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey < 400 AND o_orderkey < 6000"
    )
    s.sql("DELETE FROM __fkn_parent WHERE ckey % 3 = 0")
    return s.sql(
        """
SELECT count(*) AS n_rows,
       count(ckey) AS n_keyed,
       sum(CASE WHEN ckey IS NULL THEN 1 ELSE 0 END) AS n_nulled
FROM __fkn_child
"""
    )


register_split(
    "fk_set_null_orphans",
    fk_set_null_orphans,
    """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_custkey % 3 <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keyed,
       CAST(sum(CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nulled
FROM orders WHERE o_custkey < 400 AND o_orderkey < 6000
""",
)


# --- ON UPDATE CASCADE: parent re-key propagates to children -----------------
def fk_update_cascade_rekey(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__fku_child", "__fku_parent"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE __fku_parent (nkey bigint PRIMARY KEY, nname text)")
    s.sql(
        "CREATE TABLE __fku_child (skey bigint, nkey bigint REFERENCES "
        "__fku_parent (nkey) ON UPDATE CASCADE)"
    )
    s.sql("INSERT INTO __fku_parent SELECT n_nationkey, n_name FROM nation")
    s.sql(
        "INSERT INTO __fku_child SELECT s_suppkey, s_nationkey FROM supplier"
    )
    # re-key every nation by +100: children must follow
    s.sql("UPDATE __fku_parent SET nkey = nkey + 100")
    return s.sql(
        """
SELECT nkey, count(*) AS n_suppliers
FROM __fku_child GROUP BY nkey ORDER BY nkey
"""
    )


register_split(
    "fk_update_cascade_rekey",
    fk_update_cascade_rekey,
    """
SELECT s_nationkey + 100 AS nkey, count(*) AS n_suppliers
FROM supplier GROUP BY 1 ORDER BY nkey
""",
)


# --- UPDATE .. FROM (join-DML; r6 pytest-only, now value-exact) --------------
def update_from_enrich(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __uf_orders")
    s.sql(
        "CREATE TABLE __uf_orders (okey bigint, ckey bigint, price double, "
        "segment text)"
    )
    s.sql(
        "INSERT INTO __uf_orders SELECT o_orderkey, o_custkey, "
        "o_totalprice, 'unknown' FROM orders WHERE o_orderkey < 4000"
    )
    s.sql(
        "UPDATE __uf_orders SET segment = c.c_mktsegment "
        "FROM customer c WHERE __uf_orders.ckey = c.c_custkey"
    )
    return s.sql(
        """
SELECT segment, count(*) AS n,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __uf_orders GROUP BY segment ORDER BY segment
"""
    )


register_split(
    "update_from_enrich",
    update_from_enrich,
    """
SELECT coalesce(c.c_mktsegment, 'unknown') AS segment, count(*) AS n,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey < 4000
GROUP BY 1 ORDER BY segment
""",
)


# --- DELETE .. USING (join-DML) ----------------------------------------------
def delete_using_filter(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __du_items")
    s.sql(
        "CREATE TABLE __du_items (okey bigint, qty double, flag text)"
    )
    s.sql(
        "INSERT INTO __du_items SELECT l_orderkey, l_quantity, "
        "l_returnflag FROM lineitem WHERE l_orderkey < 3000"
    )
    # drop every item belonging to a 1-URGENT order
    s.sql(
        "DELETE FROM __du_items USING orders o "
        "WHERE __du_items.okey = o.o_orderkey "
        "AND o.o_orderpriority = '1-URGENT'"
    )
    return s.sql(
        """
SELECT flag, count(*) AS n,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM __du_items GROUP BY flag ORDER BY flag
"""
    )


register_split(
    "delete_using_filter",
    delete_using_filter,
    """
SELECT l.l_returnflag AS flag, count(*) AS n,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS total_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_orderkey < 3000 AND o.o_orderpriority <> '1-URGENT'
GROUP BY 1 ORDER BY flag
""",
)


# --- ALTER COLUMN TYPE (rewrite-with-cast through copy-on-write) -------------
def alter_column_type_rollup(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __act_t")
    s.sql("CREATE TABLE __act_t (okey bigint, price_txt text, d date)")
    s.sql(
        "INSERT INTO __act_t SELECT o_orderkey, CAST(o_totalprice AS "
        "STRING), o_orderdate FROM orders WHERE o_orderkey < 4000"
    )
    s.sql("ALTER TABLE __act_t ALTER COLUMN price_txt TYPE double precision")
    # USING form: derive an integer bucket during the type change
    s.sql(
        "ALTER TABLE __act_t ALTER COLUMN okey TYPE integer "
        "USING CAST(okey % 1000 AS INT)"
    )
    return s.sql(
        """
SELECT okey % 7 AS g, count(*) AS n,
       CAST(sum(CAST(price_txt AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __act_t GROUP BY okey % 7 ORDER BY g
"""
    )


register_split(
    "alter_column_type_rollup",
    alter_column_type_rollup,
    """
SELECT CAST((o_orderkey % 1000) % 7 AS INT) AS g, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderkey < 4000
GROUP BY 1 ORDER BY g
""",
)


# --- TRUNCATE ... CASCADE ----------------------------------------------------
def truncate_cascade_state(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__tc_child", "__tc_parent"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE __tc_parent (k bigint PRIMARY KEY)")
    s.sql(
        "CREATE TABLE __tc_child (k bigint REFERENCES __tc_parent (k), "
        "v bigint)"
    )
    s.sql(
        "INSERT INTO __tc_parent SELECT DISTINCT o_orderkey FROM orders "
        "WHERE o_orderkey < 500"
    )
    s.sql(
        "INSERT INTO __tc_child SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_orderkey < 500"
    )
    before_p = s.spark.table("__tc_parent").count()
    before_c = s.spark.table("__tc_child").count()
    refused = 0
    try:
        s.sql("TRUNCATE __tc_parent")
    except ValueError:
        refused = 1  # PG refuses without CASCADE — part of the contract
    s.sql("TRUNCATE __tc_parent CASCADE")
    return spark.createDataFrame(
        [(
            int(before_p),
            int(before_c),
            int(refused),
            int(s.spark.table("__tc_parent").count()),
            int(s.spark.table("__tc_child").count()),
        )],
        "before_parent long, before_child long, refused_plain long, "
        "after_parent long, after_child long",
    )


register_split(
    "truncate_cascade_state",
    truncate_cascade_state,
    """
SELECT (SELECT count(DISTINCT o_orderkey) FROM orders
        WHERE o_orderkey < 500) AS before_parent,
       (SELECT count(*) FROM orders WHERE o_orderkey < 500)
         AS before_child,
       CAST(1 AS BIGINT) AS refused_plain,
       CAST(0 AS BIGINT) AS after_parent,
       CAST(0 AS BIGINT) AS after_child
""",
)


# --- named restore point over the transaction log ---------------------------
# The oracle re-derives BOTH states the statement sequence must have
# produced: the post-append head and the restored point. Versions are
# deterministic (create=0, append=1, 2pc-restore=2).
def restore_point_time_travel(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from citus_spark.session import register_views
    from citus_spark.sources.txlog import TxCluster, TxTable

    s = register_views(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="citus_spark_rp_entry_")
    try:
        base = s.spark.sql(
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_orderkey < 1000"
        )
        t = TxTable.create(spark, os.path.join(d, "t"), base)
        cl = TxCluster(os.path.join(d, "coord"))
        cl.register("t", t)
        cl.create_restore_point("p0")
        t.append(
            s.spark.sql(
                "SELECT o_orderkey, o_totalprice FROM orders "
                "WHERE o_orderkey >= 1000 AND o_orderkey < 2000"
            )
        )
        head_n = t.read().count()
        cl.restore_to_point("p0")
        restored = t.read()
        n_restored = restored.count()
        from pyspark.sql import functions as F

        total = restored.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        ).collect()[0].x
        ver = t.latest_version()
        return spark.createDataFrame(
            [(int(head_n), int(n_restored), float(total), int(ver))],
            "head_rows long, restored_rows long, restored_total double, "
            "final_version long",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


register_split(
    "restore_point_time_travel",
    restore_point_time_travel,
    """
SELECT (SELECT count(*) FROM orders WHERE o_orderkey < 2000) AS head_rows,
       (SELECT count(*) FROM orders WHERE o_orderkey < 1000)
         AS restored_rows,
       (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderkey < 1000) AS restored_total,
       CAST(2 AS BIGINT) AS final_version
""",
)


# --- shard placements: round-robin metadata is re-derivable ------------------
# Three workers registered; pg_dist_placement assigns hash buckets
# round-robin over their group ids (the reference's default
# rebalancer target). The oracle recomputes groupid = groups[i mod 3]
# over the shard index — pure arithmetic, value-exact.
def placement_round_robin(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __plc_t")
    s.sql("CREATE TABLE __plc_t (k bigint)")
    s.sql("SELECT create_distributed_table('__plc_t', 'k')")
    for i in (1, 2, 3):
        s.sql(f"SELECT citus_add_node('worker{i}', {5432 + i})")
    from citus_spark import cluster

    base = cluster.shard_base_ids(s)["__plc_t"]
    df = cluster.pg_dist_placement_df(s)
    from pyspark.sql import functions as F

    return (
        df.filter(
            (F.col("shardid") >= base)
            & (F.col("shardid") < base + 32)
        )
        .select(
            (F.col("shardid") - base).alias("shard_index"),
            "groupid",
        )
        .orderBy("shard_index")
    )


def _placement_oracle() -> str:
    # groups are allocated 1,2,3 in citus_add_node order
    return """
SELECT CAST(i AS BIGINT) AS shard_index,
       CAST(1 + (i % 3) AS INT) AS groupid
FROM range(32) t(i) ORDER BY shard_index
"""


register_split(
    "placement_round_robin", placement_round_robin, _placement_oracle()
)


# --- MERGE WHEN MATCHED [AND cond] THEN DELETE -------------------------------
# ↔ reference merge_planner.c routing the full action surface; the
# delete action is the retention idiom (purge matched-and-stale rows,
# insert the new arrivals) regress exercises.
def merge_matched_delete(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __mmd_t")
    s.sql("CREATE TABLE __mmd_t (okey bigint, price double, status text)")
    s.sql(
        "INSERT INTO __mmd_t SELECT o_orderkey, o_totalprice, "
        "o_orderstatus FROM orders WHERE o_orderkey < 3000"
    )
    # source: every order under 4000 — matched 'F' rows get purged,
    # unmatched source rows insert as fresh 'NEW' rows
    s.sql(
        "MERGE INTO __mmd_t AS t USING "
        "(SELECT o_orderkey AS okey, o_totalprice AS price FROM orders "
        "WHERE o_orderkey < 4000) AS src ON t.okey = src.okey "
        "WHEN MATCHED AND t.status = 'F' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT (okey, price, status) "
        "VALUES (src.okey, src.price, 'NEW')"
    )
    return s.sql(
        """
SELECT status, count(*) AS n,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __mmd_t GROUP BY status ORDER BY status
"""
    )


register_split(
    "merge_matched_delete",
    merge_matched_delete,
    """
WITH survivors AS (
  SELECT o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey < 3000 AND o_orderstatus <> 'F'
  UNION ALL
  SELECT 'NEW' AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey >= 3000 AND o_orderkey < 4000
)
SELECT status, count(*) AS n,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM survivors GROUP BY status ORDER BY status
""",
)


# --- UPDATE ... RETURNING: the statement's own output is the result ---------
def update_returning_values(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __ur_t")
    s.sql("CREATE TABLE __ur_t (okey bigint, price double)")
    s.sql(
        "INSERT INTO __ur_t SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < 800"
    )
    out = s.sql(
        "UPDATE __ur_t SET price = price * 1.1 WHERE okey % 5 = 0 "
        "RETURNING okey, price AS new_price"
    )
    return out.orderBy("okey")


register_split(
    "update_returning_values",
    update_returning_values,
    """
SELECT o_orderkey AS okey,
       o_totalprice * 1.1 AS new_price
FROM orders WHERE o_orderkey < 800 AND o_orderkey % 5 = 0
ORDER BY okey
""",
)


# --- INSERT ... ON CONFLICT DO NOTHING ---------------------------------------
def insert_conflict_do_nothing(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __icn_t")
    s.sql("CREATE TABLE __icn_t (okey bigint PRIMARY KEY, price double)")
    s.sql(
        "INSERT INTO __icn_t SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < 1500"
    )
    # overlapping batch: existing keys skipped, fresh keys inserted,
    # and the skipped rows' DIFFERENT price must NOT overwrite
    s.sql(
        "INSERT INTO __icn_t SELECT o_orderkey, 0.0 FROM orders "
        "WHERE o_orderkey < 2500 ON CONFLICT (okey) DO NOTHING"
    )
    return s.sql(
        """
SELECT count(*) AS n,
       CAST(sum(CASE WHEN price = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __icn_t
"""
    )


register_split(
    "insert_conflict_do_nothing",
    insert_conflict_do_nothing,
    """
SELECT (SELECT count(*) FROM orders WHERE o_orderkey < 2500) AS n,
       (SELECT count(*) FROM orders
        WHERE o_orderkey >= 1500 AND o_orderkey < 2500) AS n_zero,
       (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderkey < 1500) AS total
""",
)


# --- COPY TO / COPY FROM roundtrip -------------------------------------------
# ↔ reference commands/multi_copy.c (COPY is its bulk path). The
# statement surface writes csv out and ingests it back; the oracle is
# the source aggregate — a lossy roundtrip would show immediately.
def copy_csv_roundtrip(spark, sf_dir):
    import shutil
    import tempfile

    s = _sess(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="citus_spark_copy_rt_")
    try:
        for t in ("__cp_out", "__cp_in"):
            s.sql(f"DROP TABLE IF EXISTS {t}")
        s.sql("CREATE TABLE __cp_out (okey bigint, status text, price double)")
        s.sql(
            "INSERT INTO __cp_out SELECT o_orderkey, o_orderstatus, "
            "o_totalprice FROM orders WHERE o_orderkey < 2000"
        )
        s.sql(f"COPY __cp_out TO '{d}/out.csv' WITH (FORMAT csv, HEADER)")
        s.sql("CREATE TABLE __cp_in (okey bigint, status text, price double)")
        s.sql(f"COPY __cp_in FROM '{d}/out.csv' WITH (FORMAT csv, HEADER)")
        return s.sql(
            """
SELECT status, count(*) AS n,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __cp_in GROUP BY status ORDER BY status
"""
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


register_split(
    "copy_csv_roundtrip",
    copy_csv_roundtrip,
    """
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderkey < 2000
GROUP BY 1 ORDER BY status
""",
)


# --- undistribute → redistribute roundtrip -----------------------------------
# ↔ reference undistribute_table / create_distributed_table cycle
# (alter_table.c): the physical layout changes twice, values never.
def redistribute_roundtrip(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __rd_t")
    s.sql("CREATE TABLE __rd_t (k bigint, v double)")
    s.sql(
        "INSERT INTO __rd_t SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < 3000"
    )
    s.sql("SELECT create_distributed_table('__rd_t', 'k')")
    s.sql("SELECT undistribute_table('__rd_t')")
    s.sql("SELECT create_distributed_table('__rd_t', 'k')")
    assert s.catalog.get("__rd_t").is_hash_distributed
    return s.sql(
        """
SELECT CAST(k % 8 AS BIGINT) AS g, count(*) AS n,
       CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM __rd_t GROUP BY k % 8 ORDER BY g
"""
    )


register_split(
    "redistribute_roundtrip",
    redistribute_roundtrip,
    """
SELECT CAST(o_orderkey % 8 AS BIGINT) AS g, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderkey < 3000
GROUP BY 1 ORDER BY g
""",
)


# --- placements stay stable across a shard split -----------------------------
# ↔ the r7 review finding: splitting one bucket must NOT relocate any
# other shard. Two workers registered; the stable-identity rule makes
# every placement pure arithmetic — groupid = groups[key mod 2] where
# key is the bucket number for unsplit buckets and the absolute child
# id for split children (fresh-session child ids are 104001/104002).
# The oracle re-derives the whole placement census without knowing
# WHICH bucket split (that depends on the engine hash): 31 unsplit
# buckets all stable, 2 children all stable.
def split_placement_stability(spark, sf_dir):
    from citus_spark import cluster

    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __sps_t")
    s.sql("CREATE TABLE __sps_t (k bigint)")
    s.sql("SELECT create_distributed_table('__sps_t', 'k')")
    s.sql("INSERT INTO __sps_t SELECT id FROM range(0, 300)")
    for i in (1, 2):
        s.sql(f"SELECT citus_add_node('w{i}', {6000 + i})")
    sid = cluster.get_shard_id_for_distribution_column(s, "__sps_t", 1)
    split_bucket = sid - cluster.shard_base_ids(s)["__sps_t"]
    children = cluster.citus_split_shard_by_split_points(s, sid, [0])
    base = cluster.shard_base_ids(s)["__sps_t"]
    pm = cluster._placement_map(s)
    groups = [1, 2]  # nodeid order

    def stable(key, sid_):
        return pm[sid_] == [groups[key % 2]]

    n_buckets = n_buckets_stable = 0
    for b in range(32):
        if b == split_bucket:
            continue
        n_buckets += 1
        n_buckets_stable += int(stable(b, base + b))
    n_children = len(children)
    n_children_stable = sum(int(stable(c, c)) for c in children)
    child_ids = sorted(int(c) for c in children)
    return spark.createDataFrame(
        [
            ("bucket", int(n_buckets), int(n_buckets_stable), None),
            ("child", int(n_children), int(n_children_stable),
             int(child_ids[0])),
        ],
        "kind string, n long, n_stable long, first_child long",
    ).orderBy("kind")


register_split(
    "split_placement_stability",
    split_placement_stability,
    """
SELECT 'bucket' AS kind, CAST(31 AS BIGINT) AS n,
       CAST(31 AS BIGINT) AS n_stable, CAST(NULL AS BIGINT) AS first_child
UNION ALL
SELECT 'child' AS kind, CAST(2 AS BIGINT) AS n,
       CAST(2 AS BIGINT) AS n_stable, CAST(104001 AS BIGINT) AS first_child
ORDER BY kind
""",
)


# ---------------------------------------------------------------------------
# Registered r8 (tests/test_r8_candidates.py also proves DuckDB
# parity directly at 3 SFs).


# EXCLUDE constraint lifecycle: the booking/no-overlap idiom. Rows
# whose slot set overlaps an already-accepted row in the same room are
# rejected statement-by-statement; the oracle re-derives every
# acceptance decision from the same fixture-driven insert order.
def exclude_constraint_bookings(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __ex_book")
    s.sql("CREATE TABLE __ex_book (room int, day int, tag text)")
    s.sql(
        "ALTER TABLE __ex_book ADD CONSTRAINT no_dbl "
        "EXCLUDE (room WITH =, day WITH =)"
    )
    # statement 1: distinct (room, day) pairs from orders — accepted
    s.sql(
        "INSERT INTO __ex_book SELECT room, day, 'first' FROM ("
        "SELECT CAST(o_orderkey % 7 AS INT) AS room, "
        "CAST(o_custkey % 5 AS INT) AS day, "
        "row_number() OVER (PARTITION BY o_orderkey % 7, o_custkey % 5 "
        "ORDER BY o_orderkey) AS rn "
        "FROM orders WHERE o_orderkey < 200) WHERE rn = 1"
    )
    # statement 2: collides with statement 1 on every row — rejected
    # as a whole (statement-level atomicity), table unchanged
    try:
        s.sql(
            "INSERT INTO __ex_book SELECT CAST(o_orderkey % 7 AS INT), "
            "CAST(o_custkey % 5 AS INT), 'dup' FROM orders "
            "WHERE o_orderkey < 50 LIMIT 1"
        )
        raise AssertionError("exclusion violation not raised")
    except ValueError:
        pass
    # statement 3: rooms 100+ cannot collide — accepted
    s.sql(
        "INSERT INTO __ex_book VALUES (100, 1, 'late'), (101, 1, 'late')"
    )
    return s.sql(
        """
SELECT tag, count(*) AS n, CAST(sum(room) AS BIGINT) AS room_sum,
       CAST(sum(day) AS BIGINT) AS day_sum
FROM __ex_book GROUP BY tag ORDER BY tag
"""
    )


EXCLUDE_BOOKINGS_ORACLE = """
WITH firsts AS (
  SELECT CAST(o_orderkey % 7 AS INT) AS room,
         CAST(o_custkey % 5 AS INT) AS day,
         row_number() OVER (PARTITION BY o_orderkey % 7, o_custkey % 5
                            ORDER BY o_orderkey) AS rn
  FROM orders WHERE o_orderkey < 200
), accepted AS (
  SELECT room, day, 'first' AS tag FROM firsts WHERE rn = 1
  UNION ALL
  SELECT 100, 1, 'late' UNION ALL SELECT 101, 1, 'late'
)
SELECT tag, count(*) AS n, CAST(sum(room) AS BIGINT) AS room_sum,
       CAST(sum(day) AS BIGINT) AS day_sum
FROM accepted GROUP BY tag ORDER BY tag
"""


# nextval in UPDATE: per-affected-row draws. The row→value pairing
# follows partition order (the engine guarantees uniqueness, like the
# reference), so the entry returns PAIRING-INVARIANT aggregates of
# the drawn block: count, min, max, sum are fully determined by the
# block [start, start + n·inc).
def update_nextval_block(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __seq_upd")
    s.sql("DROP SEQUENCE IF EXISTS __upd_seq")
    s.sql("CREATE SEQUENCE __upd_seq START WITH 1000")
    s.sql("CREATE TABLE __seq_upd (okey bigint, batch_id bigint, prio text)")
    s.sql(
        "INSERT INTO __seq_upd SELECT o_orderkey, CAST(0 AS BIGINT), "
        "o_orderpriority FROM orders WHERE o_orderkey < 3000"
    )
    s.sql(
        "UPDATE __seq_upd SET batch_id = nextval('__upd_seq') "
        "WHERE prio = '1-URGENT'"
    )
    return s.sql(
        """
SELECT prio, count(*) AS n,
       CAST(min(batch_id) AS BIGINT) AS min_id,
       CAST(max(batch_id) AS BIGINT) AS max_id,
       CAST(sum(batch_id) AS BIGINT) AS id_sum,
       count(DISTINCT batch_id) AS n_distinct
FROM __seq_upd GROUP BY prio ORDER BY prio
"""
    )


UPDATE_NEXTVAL_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS okey, o_orderpriority AS prio FROM orders
  WHERE o_orderkey < 3000
), cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_urgent FROM base
  WHERE prio = '1-URGENT'
)
SELECT prio, count(*) AS n,
       CAST(CASE WHEN prio = '1-URGENT' THEN 1000 ELSE 0 END AS BIGINT)
         AS min_id,
       CAST(CASE WHEN prio = '1-URGENT'
                 THEN 999 + (SELECT n_urgent FROM cnt)
                 ELSE 0 END AS BIGINT) AS max_id,
       CAST(CASE WHEN prio = '1-URGENT'
                 THEN (999 + 1000 + (SELECT n_urgent FROM cnt))
                      * (SELECT n_urgent FROM cnt) / 2
                 ELSE 0 END AS BIGINT) AS id_sum,
       CAST(CASE WHEN prio = '1-URGENT' THEN (SELECT n_urgent FROM cnt)
                 ELSE 1 END AS BIGINT) AS n_distinct
FROM base GROUP BY prio ORDER BY prio
"""


# Stored generated columns + column DEFAULTs across the write surface:
# INSERT (omitted column takes DEFAULT; DEFAULT token in VALUES),
# UPDATE of a base column recomputing the generated one, and MERGE
# upsert recomputing on both branches. The oracle re-derives every
# value from the same fixture rows.
def generated_column_writes(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __gen_w")
    s.sql(
        "CREATE TABLE __gen_w (okey bigint, price double precision, "
        "cents bigint GENERATED ALWAYS AS "
        "(CAST(round(price * 100) AS BIGINT)) STORED, "
        "src text DEFAULT 'seed')"
    )
    s.sql(
        "INSERT INTO __gen_w (okey, price) SELECT o_orderkey, "
        "o_totalprice FROM orders WHERE o_orderkey < 2000"
    )
    s.sql(
        "INSERT INTO __gen_w (okey, price, src) "
        "VALUES (9000001, 1.25, DEFAULT), (9000002, 2.75, 'manual')"
    )
    s.sql("UPDATE __gen_w SET price = price * 2 WHERE okey % 5 = 0")
    s.sql(
        "MERGE INTO __gen_w AS t USING "
        "(SELECT o_orderkey AS okey, o_totalprice FROM orders "
        "WHERE o_orderkey >= 2000 AND o_orderkey < 2500) AS s "
        "ON t.okey = s.okey "
        "WHEN MATCHED THEN UPDATE SET price = s.o_totalprice "
        "WHEN NOT MATCHED THEN INSERT (okey, price) "
        "VALUES (s.okey, s.o_totalprice + 0.5)"
    )
    return s.sql(
        """
SELECT src, count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(min(cents) AS BIGINT) AS cents_min
FROM __gen_w GROUP BY src ORDER BY src
"""
    )


GENERATED_WRITES_ORACLE = """
WITH seeded AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, 'seed' AS src
  FROM orders WHERE o_orderkey < 2000
  UNION ALL SELECT 9000001, 1.25, 'seed'
  UNION ALL SELECT 9000002, 2.75, 'manual'
), updated AS (
  SELECT okey,
         CASE WHEN okey % 5 = 0 THEN price * 2 ELSE price END AS price,
         src
  FROM seeded
), merged AS (
  SELECT u.okey,
         coalesce(o.o_totalprice, u.price) AS price,
         u.src
  FROM updated u LEFT JOIN orders o
    ON u.okey = o.o_orderkey AND o.o_orderkey >= 2000
   AND o.o_orderkey < 2500
  UNION ALL
  SELECT o_orderkey, o_totalprice + 0.5, 'seed'
  FROM orders
  WHERE o_orderkey >= 2000 AND o_orderkey < 2500
    AND o_orderkey NOT IN (SELECT okey FROM updated)
)
SELECT src, count(*) AS n,
       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum,
       CAST(min(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
         AS cents_min
FROM merged GROUP BY src ORDER BY src
"""


# UPDATE..FROM rekey rippling through ON UPDATE CASCADE — join-DML
# driving the referential-action engine (previously rejected; the
# FROM form now derives the old/new remap).
def update_from_cascade_rekey(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__ufc_items", "__ufc_orders", "__ufc_map"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql("CREATE TABLE __ufc_orders (okey bigint PRIMARY KEY, prio text)")
    s.sql(
        "CREATE TABLE __ufc_items (okey bigint REFERENCES __ufc_orders "
        "(okey) ON UPDATE CASCADE, qty double precision)"
    )
    s.sql("CREATE TABLE __ufc_map (old_k bigint, new_k bigint)")
    s.sql(
        "INSERT INTO __ufc_orders SELECT o_orderkey, o_orderpriority "
        "FROM orders WHERE o_orderkey < 1500"
    )
    s.sql(
        "INSERT INTO __ufc_items SELECT l_orderkey, l_quantity "
        "FROM lineitem WHERE l_orderkey < 1500"
    )
    s.sql(
        "INSERT INTO __ufc_map SELECT o_orderkey, o_orderkey + 1000000 "
        "FROM orders WHERE o_orderkey < 1500 AND o_orderkey % 3 = 0"
    )
    s.sql(
        "UPDATE __ufc_orders SET okey = __ufc_map.new_k FROM __ufc_map "
        "WHERE __ufc_orders.okey = __ufc_map.old_k"
    )
    return s.sql(
        """
SELECT CAST(okey >= 1000000 AS INT) AS rekeyed,
       count(*) AS n_items,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
       CAST(min(okey) AS BIGINT) AS min_key
FROM __ufc_items GROUP BY 1 ORDER BY 1
"""
    )


UPDATE_FROM_CASCADE_ORACLE = """
WITH items AS (
  SELECT CASE WHEN l_orderkey % 3 = 0
              THEN l_orderkey + 1000000 ELSE l_orderkey END AS okey,
         l_quantity AS qty
  FROM lineitem WHERE l_orderkey < 1500
)
SELECT CAST(okey >= 1000000 AS INT) AS rekeyed,
       count(*) AS n_items,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
       CAST(min(okey) AS BIGINT) AS min_key
FROM items GROUP BY 1 ORDER BY 1
"""


# Sequence bounds + CYCLE through the textual surface: a bounded
# ascending sequence exhausts, errors, cycles after ALTER; the drawn
# ids are deterministic so the oracle re-derives them exactly.
def sequence_bounds_cycle(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __seq_b")
    s.sql("DROP SEQUENCE IF EXISTS __b_seq")
    s.sql(
        "CREATE SEQUENCE __b_seq INCREMENT BY 3 MINVALUE 10 "
        "MAXVALUE 30 START WITH 10"
    )
    s.sql("CREATE TABLE __seq_b (tag text, v bigint)")
    # 7 draws fit ([10..28]); the 8th would pass 30 → error; after
    # ALTER CYCLE the next draw restarts at MINVALUE
    for i in range(7):
        s.sql(f"INSERT INTO __seq_b VALUES ('fit', nextval('__b_seq'))")
    try:
        s.sql("INSERT INTO __seq_b VALUES ('over', nextval('__b_seq'))")
        raise AssertionError("bound not enforced")
    except ValueError:
        pass
    s.sql("ALTER SEQUENCE __b_seq CYCLE")
    s.sql("INSERT INTO __seq_b VALUES ('wrapped', nextval('__b_seq'))")
    return s.sql(
        """
SELECT tag, count(*) AS n, CAST(min(v) AS BIGINT) AS v_min,
       CAST(max(v) AS BIGINT) AS v_max, CAST(sum(v) AS BIGINT) AS v_sum
FROM __seq_b GROUP BY tag ORDER BY tag
"""
    )


SEQUENCE_BOUNDS_ORACLE = """
WITH draws AS (
  SELECT 'fit' AS tag, unnest([10, 13, 16, 19, 22, 25, 28]) AS v
  UNION ALL SELECT 'wrapped', 10
)
SELECT tag, count(*) AS n, CAST(min(v) AS BIGINT) AS v_min,
       CAST(max(v) AS BIGINT) AS v_max, CAST(sum(v) AS BIGINT) AS v_sum
FROM draws GROUP BY tag ORDER BY tag
"""

register_split(
    "exclude_constraint_bookings",
    exclude_constraint_bookings,
    EXCLUDE_BOOKINGS_ORACLE,
)
register_split(
    "update_nextval_block", update_nextval_block, UPDATE_NEXTVAL_ORACLE
)
register_split(
    "generated_column_writes", generated_column_writes, GENERATED_WRITES_ORACLE
)
register_split(
    "update_from_cascade_rekey",
    update_from_cascade_rekey,
    UPDATE_FROM_CASCADE_ORACLE,
)
register_split(
    "sequence_bounds_cycle", sequence_bounds_cycle, SEQUENCE_BOUNDS_ORACLE
)


# --- PG declarative partitioning DDL (r8) -----------------------------------
# ↔ reference src/test/regress/sql/multi_partitioning.sql:16-40 (the
# CREATE .. PARTITION BY / PARTITION OF / DETACH flow) over fixture
# orders. The oracle re-derives every routing decision: range bounds
# replay as CASE predicates; the detached partition keeps its rows
# but leaves the parent.
def time_partition_ddl(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __tp_orders")
    s.sql("DROP TABLE IF EXISTS __tp_1995")  # in case of a prior detach
    s.sql(
        "CREATE TABLE __tp_orders (okey bigint, odate timestamp, "
        "price double precision) PARTITION BY RANGE (odate)"
    )
    s.sql(
        "CREATE TABLE __tp_1995 PARTITION OF __tp_orders "
        "FOR VALUES FROM ('1995-01-01') TO ('1996-01-01')"
    )
    s.sql(
        "CREATE TABLE __tp_1996 PARTITION OF __tp_orders "
        "FOR VALUES FROM ('1996-01-01') TO ('1997-01-01')"
    )
    s.sql("CREATE TABLE __tp_rest PARTITION OF __tp_orders DEFAULT")
    s.sql(
        "INSERT INTO __tp_orders SELECT o_orderkey, o_orderdate, "
        "o_totalprice FROM orders WHERE o_orderkey < 4000"
    )
    # retention: last year's partition leaves the parent in O(1) —
    # no row-level DELETE (the create_time_partitions story as DDL)
    s.sql("ALTER TABLE __tp_orders DETACH PARTITION __tp_1995")
    return s.sql(
        """
SELECT part, n, price_sum FROM (
  SELECT 'parent' AS part, count(*) AS n,
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
  FROM __tp_orders
  UNION ALL
  SELECT '1996', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __tp_1996
  UNION ALL
  SELECT 'detached_1995', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __tp_1995
  UNION ALL
  SELECT 'default', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __tp_rest
) ORDER BY part
"""
    )


TIME_PARTITION_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS okey, o_orderdate AS odate,
         o_totalprice AS price
  FROM orders WHERE o_orderkey < 4000
), routed AS (
  SELECT *,
         CASE WHEN odate >= '1995-01-01' AND odate < '1996-01-01'
              THEN '1995'
              WHEN odate >= '1996-01-01' AND odate < '1997-01-01'
              THEN '1996'
              ELSE 'default' END AS part
  FROM src
), agg AS (
  SELECT part, count(*) AS n,
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
  FROM routed GROUP BY part
)
SELECT CASE WHEN part = '1995' THEN 'detached_1995' ELSE part END AS part,
       n, price_sum
FROM agg
UNION ALL
SELECT 'parent',
       CAST(sum(CASE WHEN part <> '1995' THEN n ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN part <> '1995'
                     THEN CAST(price_sum AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
FROM agg
ORDER BY part
"""

register_split("time_partition_ddl", time_partition_ddl, TIME_PARTITION_ORACLE)


# Hash partitioning — routing uses the engine's portable hash64
# (md5-based), so the oracle replays the exact per-child layout.
def hash_partition_ddl(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __hp_orders")
    s.sql(
        "CREATE TABLE __hp_orders (okey bigint, prio text) "
        "PARTITION BY HASH (okey)"
    )
    for r in range(4):
        s.sql(
            f"CREATE TABLE __hp_orders_{r} PARTITION OF __hp_orders "
            f"FOR VALUES WITH (MODULUS 4, REMAINDER {r})"
        )
    s.sql(
        "INSERT INTO __hp_orders SELECT o_orderkey, o_orderpriority "
        "FROM orders WHERE o_orderkey < 3000"
    )
    return s.sql(
        """
SELECT part, n, okey_sum FROM (
  SELECT '0' AS part, count(*) AS n, CAST(sum(okey) AS BIGINT) AS okey_sum
  FROM __hp_orders_0
  UNION ALL SELECT '1', count(*), CAST(sum(okey) AS BIGINT) FROM __hp_orders_1
  UNION ALL SELECT '2', count(*), CAST(sum(okey) AS BIGINT) FROM __hp_orders_2
  UNION ALL SELECT '3', count(*), CAST(sum(okey) AS BIGINT) FROM __hp_orders_3
  UNION ALL SELECT 'parent', count(*), CAST(sum(okey) AS BIGINT)
  FROM __hp_orders
) ORDER BY part
"""
    )


def _hash_partition_oracle() -> str:
    from citus_spark.functions import hash64_duck

    h = hash64_duck("coalesce(CAST(o_orderkey AS VARCHAR), '')")
    return f"""
WITH src AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey < 3000
), routed AS (
  SELECT o_orderkey,
         CAST((({h}) % 4 + 4) % 4 AS VARCHAR) AS part
  FROM src
)
SELECT part, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS okey_sum
FROM routed GROUP BY part
UNION ALL
SELECT 'parent', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM src
ORDER BY part
"""


register_split(
    "hash_partition_ddl", hash_partition_ddl, _hash_partition_oracle()
)


# --- COPY FROM STDIN (r8) ----------------------------------------------------
# ↔ reference commands/multi_copy.c stdin path: a psql-dump-shaped
# here-doc statement (tab-delimited, \N nulls, backslash escapes,
# \. terminator) loads through the same funnel as file COPY, then
# joins fixture orders. The oracle re-derives the literal payload as
# VALUES (the payload is part of the statement, i.e. spec, not data).
def copy_stdin_replay(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __stdin_t")
    s.sql(
        "CREATE TABLE __stdin_t (okey bigint, tag text, "
        "weight double precision)"
    )
    s.sql(
        "COPY __stdin_t (okey, tag, weight) FROM stdin;\n"
        "1\talpha\t1.5\n"
        "2\t\\N\t2.5\n"
        "3\twith\\ttab\t\\N\n"
        "32\tbeta\t0.25\n"
        "\\.\n"
    )
    return s.sql(
        """
SELECT t.tag, count(*) AS n,
       CAST(sum(CAST(coalesce(t.weight, 0.0) AS DECIMAL(18,6)))
            AS DOUBLE) AS weight_sum,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum
FROM __stdin_t t JOIN orders o ON t.okey = o.o_orderkey
GROUP BY t.tag
ORDER BY t.tag NULLS FIRST
"""
    )


COPY_STDIN_ORACLE = """
WITH loaded(okey, tag, weight) AS (
  VALUES (1, 'alpha', 1.5),
         (2, NULL, 2.5),
         (3, 'with' || chr(9) || 'tab', NULL),
         (32, 'beta', 0.25)
)
SELECT t.tag, count(*) AS n,
       CAST(sum(CAST(coalesce(t.weight, 0.0) AS DECIMAL(18,6)))
            AS DOUBLE) AS weight_sum,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum
FROM loaded t JOIN orders o ON t.okey = o.o_orderkey
GROUP BY t.tag
ORDER BY t.tag NULLS FIRST
"""

register_split("copy_stdin_replay", copy_stdin_replay, COPY_STDIN_ORACLE)


# --- UPDATE row-form assignment: SET (a, b) = (e1, e2) ----------------------
# The multi-column spelling hand-written migrations use; expanded to
# pairwise assignments by plans/rewrites.py pg_update_row_set (PG
# evaluates all RHS against the OLD row — the pairwise executor
# already guarantees that). The oracle re-derives the end state
# without running any DML.
def update_set_row_form(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __rs_items")
    s.sql(
        "CREATE TABLE __rs_items (okey bigint, qty double, tag text)"
    )
    s.sql(
        "INSERT INTO __rs_items SELECT l_orderkey, l_quantity, "
        "l_returnflag FROM lineitem WHERE l_orderkey < 3000"
    )
    # swap-flavored row form: qty doubles while tag absorbs the OLD
    # qty — proves right-hand sides see the pre-update row
    s.sql(
        "UPDATE __rs_items SET (qty, tag) = "
        "(qty * 2, tag || '-' || CAST(CAST(qty AS BIGINT) AS STRING)) "
        "WHERE okey < 1500"
    )
    return s.sql(
        """
SELECT tag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM __rs_items GROUP BY tag ORDER BY tag
"""
    )


register_split(
    "update_set_row_form",
    update_set_row_form,
    """
WITH state AS (
  SELECT CASE WHEN l_orderkey < 1500
              THEN l_returnflag || '-' ||
                   CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
              ELSE l_returnflag END AS tag,
         CASE WHEN l_orderkey < 1500 THEN l_quantity * 2
              ELSE l_quantity END AS qty
  FROM lineitem WHERE l_orderkey < 3000
)
SELECT tag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM state GROUP BY tag ORDER BY tag
""",
)


# --- information_schema introspection ----------------------------------------
# The SQL-standard tooling surface (ORMs/BI tools discover schemas
# through it before running a single query). The entry declares a
# scratch table — NOT NULL, numeric precision, defaults — and reads
# back what information_schema.columns reports; the oracle is the
# literal expectation, so any drift in type spelling, ordering, or
# nullability detection fails the hash.
def information_schema_columns(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __is_probe")
    s.sql(
        "CREATE TABLE __is_probe (id bigint NOT NULL, name text, "
        "score double precision, amt numeric(10,2), flag boolean, "
        "ts timestamp)"
    )
    return s.sql(
        """
SELECT column_name, CAST(ordinal_position AS INT) AS pos,
       data_type, CAST(numeric_precision AS INT) AS num_p,
       CAST(numeric_scale AS INT) AS num_s, is_nullable
FROM information_schema.columns
WHERE table_name = '__is_probe'
ORDER BY ordinal_position
"""
    )


register_split(
    "information_schema_columns",
    information_schema_columns,
    # PG prints bare 'numeric' in data_type; precision/scale live in
    # their own columns (NULL for non-numerics)
    """
SELECT column_name, pos, data_type,
       CAST(num_p AS INT) AS num_p, CAST(num_s AS INT) AS num_s,
       is_nullable
FROM (VALUES
  ('id',    1, 'bigint',                      NULL, NULL, 'NO'),
  ('name',  2, 'text',                        NULL, NULL, 'YES'),
  ('score', 3, 'double precision',            NULL, NULL, 'YES'),
  ('amt',   4, 'numeric',                     10,   2,    'YES'),
  ('flag',  5, 'boolean',                     NULL, NULL, 'YES'),
  ('ts',    6, 'timestamp without time zone', NULL, NULL, 'YES')
) AS t(column_name, pos, data_type, num_p, num_s, is_nullable)
ORDER BY pos
""",
)


# --- CREATE TABLE (LIKE src INCLUDING ALL) -----------------------------------
# PG's clone-the-shape spelling (session._expand_create_like). The
# clone must inherit the DEFAULT (filled on insert), the NOT NULL and
# CHECK enforcement, and the columns — the returned state proves the
# default actually fills in the clone, and the oracle re-derives it
# from the fixture without any DDL.
def create_table_like_clone(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__lk_src", "__lk_clone"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql(
        "CREATE TABLE __lk_src (okey bigint NOT NULL, "
        "prio text DEFAULT 'none', total double precision, "
        "CHECK (total IS NULL OR total >= 0))"
    )
    s.sql("CREATE TABLE __lk_clone (LIKE __lk_src INCLUDING ALL)")
    s.sql(
        "INSERT INTO __lk_clone (okey, total) "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < 2000"
    )
    s.sql(
        "INSERT INTO __lk_clone (okey, prio, total) "
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "WHERE o_orderkey >= 2000 AND o_orderkey < 4000"
    )
    return s.sql(
        """
SELECT prio, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM __lk_clone GROUP BY prio ORDER BY prio
"""
    )


register_split(
    "create_table_like_clone",
    create_table_like_clone,
    """
WITH state AS (
  SELECT CASE WHEN o_orderkey < 2000 THEN 'none'
              ELSE o_orderpriority END AS prio,
         o_totalprice AS total
  FROM orders WHERE o_orderkey < 4000
)
SELECT prio, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM state GROUP BY prio ORDER BY prio
""",
)


# --- MERGE with bare table names + positional INSERT VALUES ------------------
# PG addresses unaliased MERGE sides by table name, and a list-less
# INSERT VALUES maps to the target's declared column order — the
# review pass found the list-less form was silently DROPPED by the
# WHEN grammar (rows vanished); this entry pins both spellings.
def merge_insert_positional(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __mp_t")
    s.sql("CREATE TABLE __mp_t (okey bigint, total double precision)")
    s.sql(
        "INSERT INTO __mp_t SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 2000"
    )
    s.sql("DROP VIEW IF EXISTS __mp_src")
    s.sql(
        "CREATE VIEW __mp_src AS SELECT o_orderkey AS okey, "
        "o_totalprice FROM orders WHERE o_orderkey < 4000"
    )
    s.sql(
        "MERGE INTO __mp_t USING __mp_src "
        "ON __mp_t.okey = __mp_src.okey "
        "WHEN MATCHED THEN UPDATE SET total = __mp_src.o_totalprice + 1 "
        "WHEN NOT MATCHED THEN INSERT VALUES "
        "(__mp_src.okey, __mp_src.o_totalprice * 2)"
    )
    return s.sql(
        """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM __mp_t
"""
    )


register_split(
    "merge_insert_positional",
    merge_insert_positional,
    """
WITH state AS (
  SELECT CASE WHEN o_orderkey < 2000 THEN o_totalprice + 1
              ELSE o_totalprice * 2 END AS total
  FROM orders WHERE o_orderkey < 4000
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM state
""",
)


# --- Conditional upsert: ON CONFLICT .. DO UPDATE .. WHERE -------------------
# The PG idiom for monotone upserts (update only when the incoming
# row wins); guard-failed conflicts keep their OLD image. Mapped to a
# guarded matched branch in the shared merge executor —
# first-true-wins with no fallback IS the PG semantics.
def upsert_guarded_where(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __ug_t")
    s.sql("CREATE TABLE __ug_t (okey bigint, total double precision)")
    s.sql(
        "INSERT INTO __ug_t SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 3000"
    )
    # re-insert a wider slice at double price; the guard updates only
    # even keys — odd conflicting keys keep their OLD image (×2 keeps
    # doubles exact; an integer-parity guard keeps the split
    # deterministic in any engine)
    s.sql(
        "INSERT INTO __ug_t SELECT o_orderkey, o_totalprice * 2 "
        "FROM orders WHERE o_orderkey < 5000 "
        "ON CONFLICT (okey) DO UPDATE SET total = excluded.total "
        "WHERE __ug_t.okey % 2 = 0"
    )
    return s.sql(
        """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM __ug_t
"""
    )


register_split(
    "upsert_guarded_where",
    upsert_guarded_where,
    """
WITH state AS (
  SELECT CASE WHEN o_orderkey >= 3000 OR o_orderkey % 2 = 0
              THEN o_totalprice * 2
              ELSE o_totalprice END AS total
  FROM orders WHERE o_orderkey < 5000
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS total_sum
FROM state
""",
)


# --- LIST partitioning with a DEFAULT partition ------------------------------
# The third PARTITION BY method as PG DDL (RANGE and HASH have
# entries already): explicit value lists route by IN, NULL keys and
# unlisted values land in DEFAULT, and a cross-partition UPDATE moves
# rows between children (PG 11+ row movement).
def list_partition_default_routing(spark, sf_dir):
    s = _sess(spark, sf_dir)
    for t in ("__lp_o", "__lp_urgent", "__lp_mid", "__lp_rest"):
        s.sql(f"DROP TABLE IF EXISTS {t}")
    s.sql(
        "CREATE TABLE __lp_o (okey bigint, prio text, "
        "price double precision) PARTITION BY LIST (prio)"
    )
    s.sql(
        "CREATE TABLE __lp_urgent PARTITION OF __lp_o "
        "FOR VALUES IN ('1-URGENT', '2-HIGH')"
    )
    s.sql(
        "CREATE TABLE __lp_mid PARTITION OF __lp_o "
        "FOR VALUES IN ('3-MEDIUM')"
    )
    s.sql("CREATE TABLE __lp_rest PARTITION OF __lp_o DEFAULT")
    s.sql(
        "INSERT INTO __lp_o SELECT o_orderkey, o_orderpriority, "
        "o_totalprice FROM orders WHERE o_orderkey < 4000"
    )
    # cross-partition row movement: demote every cheap HIGH order —
    # rows must LEAVE __lp_urgent and arrive in __lp_mid
    s.sql(
        "UPDATE __lp_o SET prio = '3-MEDIUM' "
        "WHERE prio = '2-HIGH' AND price < 100000"
    )
    return s.sql(
        """
SELECT part, n, price_sum FROM (
  SELECT 'urgent' AS part, count(*) AS n,
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
  FROM __lp_urgent
  UNION ALL
  SELECT 'mid', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __lp_mid
  UNION ALL
  SELECT 'rest', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __lp_rest
  UNION ALL
  SELECT 'parent', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM __lp_o
) ORDER BY part
"""
    )


register_split(
    "list_partition_default_routing",
    list_partition_default_routing,
    """
WITH rows_ AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '2-HIGH' AND o_totalprice < 100000
              THEN '3-MEDIUM' ELSE o_orderpriority END AS prio,
         o_totalprice AS price
  FROM orders WHERE o_orderkey < 4000
), tagged AS (
  SELECT CASE WHEN prio IN ('1-URGENT', '2-HIGH') THEN 'urgent'
              WHEN prio = '3-MEDIUM' THEN 'mid'
              ELSE 'rest' END AS part, price
  FROM rows_
)
SELECT part, n, price_sum FROM (
  SELECT part, count(*) AS n,
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
  FROM tagged GROUP BY part
  UNION ALL
  SELECT 'parent', count(*),
         CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
  FROM tagged
) ORDER BY part
""",
)


# --- MERGE .. RETURNING with merge_action() (PG 17) --------------------------
# The action-tagged returning set: UPDATE rows as their NEW image,
# INSERT rows tagged INSERT, untouched rows absent. The oracle
# re-derives every action tag and image from the fixture.
def merge_returning_actions(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __mr_t")
    s.sql("CREATE TABLE __mr_t (okey bigint, total double precision)")
    s.sql(
        "INSERT INTO __mr_t SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 2000"
    )
    s.sql("DROP VIEW IF EXISTS __mr_src")
    s.sql(
        "CREATE VIEW __mr_src AS SELECT o_orderkey AS okey, "
        "o_totalprice FROM orders WHERE o_orderkey < 3000"
    )
    return s.sql(
        """
MERGE INTO __mr_t USING __mr_src ON __mr_t.okey = __mr_src.okey
WHEN MATCHED THEN UPDATE SET total = __mr_src.o_totalprice + 10
WHEN NOT MATCHED THEN INSERT VALUES (__mr_src.okey,
                                     __mr_src.o_totalprice * 3)
RETURNING merge_action() AS action, okey, total
"""
    ).orderBy("okey")


register_split(
    "merge_returning_actions",
    merge_returning_actions,
    """
SELECT CASE WHEN o_orderkey < 2000 THEN 'UPDATE' ELSE 'INSERT' END
         AS action,
       o_orderkey AS okey,
       CASE WHEN o_orderkey < 2000 THEN o_totalprice + 10
            ELSE o_totalprice * 3 END AS total
FROM orders WHERE o_orderkey < 3000
ORDER BY okey
""",
)
