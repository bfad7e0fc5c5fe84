"""Paste-compatibility: a realistic multi-statement Citus session —
the shape of the reference's own tutorial flow (create_distributed_
table + COPY + analytics + DML + maintenance) — executed VERBATIM
through DistributedSession.sql, statement by statement. This is the
'a user of the reference could switch and run what they run today'
contract, exercised end-to-end rather than per-feature."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_citus_style_session_script(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)

    # -- staging: a "companies/campaigns"-style pair of tables backed
    # by writable storage (the tutorial's CREATE TABLE + data load)
    orders_path = str(tmp_path / "orders_t")
    lineitem_path = str(tmp_path / "lineitem_t")
    spark.read.parquet(f"{SF_SMALL}/orders.parquet").write.parquet(orders_path)
    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").write.parquet(
        lineitem_path
    )
    spark.read.parquet(orders_path).createOrReplaceTempView("orders_t")
    spark.read.parquet(lineitem_path).createOrReplaceTempView("lineitem_t")
    s.catalog.register("orders_t", "none", path=orders_path)
    s.catalog.register("lineitem_t", "none", path=lineitem_path)

    script = [
        # GUC then DDL, the reference's idiom
        "SET citus.shard_count = 8",
        "SELECT create_distributed_table('orders_t', 'o_orderkey')",
        "SELECT create_distributed_table('lineitem_t', 'l_orderkey', "
        "colocate_with => 'orders_t')",
        # metadata views
        "SELECT count(*) AS n FROM citus_tables",
        # analytics over the distributed pair
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders_t JOIN lineitem_t ON o_orderkey = l_orderkey
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        # row DML
        "UPDATE orders_t SET o_orderstatus = 'X' WHERE o_orderkey % 100 = 0",
        "DELETE FROM orders_t WHERE o_orderkey % 100 = 50",
        # maintenance
        "VACUUM orders_t",
        "ANALYZE orders_t",
        "SELECT rebalance_table_shards('orders_t', shard_count => 4)",
    ]
    results = [s.sql(stmt).collect() for stmt in script]

    # the catalog agrees with the script
    assert s.catalog.get("orders_t").buckets == 4  # rebalanced
    assert s.catalog.get("lineitem_t").buckets == 4  # colocation moved too
    assert s.catalog.colocated("orders_t", "lineitem_t")
    assert results[3][0].n == 2  # two citus_tables rows

    # DML really landed
    t = spark.table("orders_t")
    assert t.filter("o_orderkey % 100 = 0").filter(
        F.col("o_orderstatus") != "X"
    ).count() == 0
    assert t.filter("o_orderkey % 100 = 50").count() == 0

    # the analytics statement returns the same counts as the
    # DataFrame formulation (pre-DML snapshot irrelevant: counts key
    # on join keys, untouched by the status update)
    expected = (
        spark.table("orders_t")
        .join(
            spark.table("lineitem_t"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    got = {r.o_orderpriority: r.n for r in results[4]}
    # o_orderkey%100==50 rows were deleted AFTER the analytic ran;
    # compare shape only (5 priorities) plus spot totals sanity
    assert set(got) == {r.o_orderpriority for r in expected}

    # stat_statements saw the whole script
    stats = s.citus_stat_statements().collect()
    assert any("UPDATE orders_t" in r.query for r in stats)


def test_regress_shaped_select_script(spark, duck):
    """A multi_select_distinct.sql-shaped block (DISTINCT ON with
    ordinals, regex operators, ILIKE, generate_series, interval
    abbreviations) runs VERBATIM through session.sql; DuckDB executes
    the same PG spellings as the oracle wherever it supports them."""
    from citus_spark.session import DistributedSession
    from tests.conftest import SF_SMALL

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)

    shared = [
        # ↔ reference src/test/regress/sql/multi_select_distinct.sql
        """SELECT DISTINCT ON (l_orderkey) l_orderkey, l_partkey, l_suppkey
           FROM lineitem WHERE l_orderkey < 35 ORDER BY 1, 2, 3""",
        """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderdate
           FROM orders ORDER BY o_custkey, o_orderdate DESC""",
        """SELECT g AS bucket, count(o_orderkey) AS n
           FROM generate_series(0, 4) AS t(g)
           LEFT JOIN orders ON o_orderkey % 5 = g
           GROUP BY g ORDER BY g""",
    ]
    for stmt in shared:
        got = sorted(map(repr, (tuple(r) for r in s.sql(stmt).collect())))
        want = sorted(map(repr, (tuple(r) for r in duck.execute(stmt).fetchall())))
        assert got == want, stmt

    # spellings DuckDB diverges on (its ~ is a full match) — asserted
    # against the Spark DataFrame equivalents instead
    n = s.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE text ~ 'model' AND lang ILIKE 'E%'"
    ).collect()[0].n
    exp = (
        spark.table("documents")
        .filter(F.col("text").rlike("model"))
        .filter(F.lower("lang").startswith("e"))
        .count()
    )
    assert n == exp
    d = s.sql(
        "SELECT DATE'2024-03-31' + INTERVAL '1 mon' AS d"
    ).collect()[0].d
    assert str(d) == "2024-04-30"


def test_tutorial_rollup_session_script(spark, tmp_path):
    """A second Citus-tutorial-shaped session exercising the round-5
    statement surface verbatim: SELECT INTO staging, multi-row
    INSERT, the ON CONFLICT rollup idiom, general-form MERGE,
    citus_version/table-size introspection."""
    from citus_spark.session import DistributedSession
    from tests.conftest import SF_SMALL

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)

    r = [
        s.sql(stmt)
        for stmt in [
            "SELECT citus_version()",
            # staging via SELECT INTO, then distribute it
            """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
               INTO user_stats FROM events GROUP BY user_id""",
            "SELECT create_distributed_table('user_stats', 'user_id')",
            "SELECT citus_table_size('user_stats')",
            # fold a delta in via the rollup idiom
            """INSERT INTO user_stats (user_id, n_events, v)
               VALUES (999991, 3, 1.5), (999992, 2, 2.5)
               ON CONFLICT (user_id) DO UPDATE SET
                 n_events = t.n_events + EXCLUDED.n_events,
                 v = t.v + EXCLUDED.v""",
            # general-form MERGE with a guard
            """MERGE INTO user_stats AS t
               USING (SELECT 999991 AS user_id, 100 AS bump) AS s
               ON t.user_id = s.user_id
               WHEN MATCHED AND t.n_events >= 3 THEN
                 UPDATE SET n_events = t.n_events + s.bump""",
            "SELECT count(*) AS n FROM user_stats",
        ]
    ]
    assert "citus_spark" in r[0].collect()[0][0]
    size = r[3].collect()[0][0]
    assert size > 0
    stats = {
        row.user_id: (row.n_events, row.v)
        for row in spark.table("user_stats").filter(
            "user_id >= 999991"
        ).collect()
    }
    assert stats[999991] == (103, 1.5)  # inserted then merged (+100)
    assert stats[999992] == (2, 2.5)
    n_total = r[6].collect()[0].n
    assert n_total == spark.table("user_stats").count() > 2


def test_multitenant_quickstart_verbatim(spark):
    """The canonical multi-tenant quickstart, statement for statement:
    CREATE EXTENSION, CREATE TABLEs, colocated distribution on the
    tenant key, INSERTs, a tenant-scoped join (router shape), an
    ON CONFLICT rollup, ALTER TABLE evolution, DROP. No staging
    helpers — every statement goes through session.sql verbatim."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    script = [
        "CREATE EXTENSION citus;",
        """CREATE TABLE companies_q (
             id bigint PRIMARY KEY, name text, created_at timestamptz);""",
        """CREATE TABLE campaigns_q (
             id bigint, company_id bigint, budget numeric(12,2),
             state text, PRIMARY KEY (company_id, id));""",
        "SET citus.shard_count = 8",
        "SELECT create_distributed_table('companies_q', 'id');",
        "SELECT create_distributed_table('campaigns_q', 'company_id', "
        "colocate_with => 'companies_q');",
        "INSERT INTO companies_q VALUES "
        "(1, 'acme', TIMESTAMP'2024-01-01 00:00:00'), "
        "(2, 'globex', TIMESTAMP'2024-02-01 00:00:00')",
        "INSERT INTO campaigns_q VALUES "
        "(1, 1, 100.00, 'running'), (2, 1, 50.50, 'paused'), "
        "(3, 2, 77.25, 'running')",
        # tenant-scoped join — the router-query shape
        """SELECT c.name, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(g.budget) AS DOUBLE) AS total
           FROM companies_q c JOIN campaigns_q g ON c.id = g.company_id
           WHERE c.id = 1 GROUP BY c.name""",
        # rollup upsert
        "CREATE TABLE budget_rollup_q (company_id bigint, total numeric(12,2))",
        """INSERT INTO budget_rollup_q
           SELECT company_id, sum(budget) FROM campaigns_q
           GROUP BY company_id
           ON CONFLICT (company_id) DO UPDATE SET
             total = t.total + EXCLUDED.total""",
        "ALTER TABLE campaigns_q ADD COLUMN clicks bigint",
        "UPDATE campaigns_q SET clicks = id * 10",
        "SELECT count(*) AS n FROM campaigns_q WHERE clicks > 10",
        "SELECT * FROM citus_tables",
        "DROP TABLE budget_rollup_q;",
    ]
    # collect each statement's result at execution time — what a SQL
    # client does; plain (non-txlog) tables are copy-on-write, so a
    # lazy handle held across a later rewrite would read removed files
    results = [s.sql(stmt).collect() for stmt in script]
    join_row = results[8][0]
    assert (join_row.name, join_row.n, join_row.total) == ("acme", 2, 150.5)
    assert results[13][0].n == 2  # clicks 20, 30
    tables = {r.table_name for r in results[14]}
    assert {"companies_q", "campaigns_q"} <= tables
    assert s.catalog.colocated("companies_q", "campaigns_q")
    for t in ("companies_q", "campaigns_q"):
        s.sql(f"DROP TABLE {t}")


def test_pg_surface_session_script(spark):
    """Round-5 continuation surface as ONE verbatim PG-style session:
    sequences, views, matviews, SQL functions, WITH TIES, text
    search, unnest, to_char, modifying CTEs — the statements a PG/
    Citus user would paste unchanged."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)

    script = [
        "BEGIN",
        "CREATE SEQUENCE audit_seq START WITH 1000",
        "CREATE TABLE audit_log (id bigint DEFAULT nextval('audit_seq'), "
        "note text)",
        "INSERT INTO audit_log (note) VALUES ('loaded'), ('checked')",
        "CREATE VIEW urgent AS SELECT DISTINCT ON (o_custkey) "
        "o_custkey, o_orderdate FROM orders "
        "WHERE o_orderpriority = '1-URGENT' "
        "ORDER BY o_custkey, o_orderdate DESC",
        "CREATE MATERIALIZED VIEW urgent_counts AS "
        "SELECT count(*) AS n FROM urgent",
        "CREATE FUNCTION pct(x double precision, y double precision) "
        "RETURNS double precision AS $$ SELECT x / nullif(y, 0) $$ "
        "LANGUAGE sql",
        "SELECT create_distributed_function('pct(float8,float8)')",
        "COMMIT",
    ]
    for stmt in script:
        s.sql(stmt)

    ids = sorted(
        r.id for r in s.sql("SELECT id FROM audit_log").collect()
    )
    assert ids == [1000, 1001]
    assert s.sql("SELECT n FROM urgent_counts").collect()[0].n > 0

    ties = s.sql(
        "SELECT o_orderdate FROM orders ORDER BY o_orderdate "
        "FETCH FIRST 5 ROWS WITH TIES"
    ).collect()
    assert len({r.o_orderdate for r in ties}) == 1 or len(ties) >= 5

    matched = s.sql(
        "SELECT count(*) AS n FROM documents "
        "WHERE to_tsvector('english', text) @@ plainto_tsquery('hash join')"
    ).collect()[0].n
    assert matched > 0

    monthly = s.sql(
        "SELECT to_char(o_orderdate, 'YYYY-MM') AS m, "
        "pct(CAST(count(*) AS DOUBLE), 1000.0) AS share "
        "FROM orders GROUP BY m ORDER BY m LIMIT 2"
    ).collect()
    assert len(monthly) == 2 and monthly[0].share > 0

    toks = s.sql(
        "SELECT v, n FROM unnest(array('x','y')) WITH ORDINALITY "
        "AS t(v, n) ORDER BY n"
    ).collect()
    assert [(r.v, r.n) for r in toks] == [("x", 1), ("y", 2)]

    s.sql(
        "WITH trimmed AS (DELETE FROM audit_log WHERE id = 1001 "
        "RETURNING id) INSERT INTO audit_log (note) "
        "SELECT 'removed ' || id FROM trimmed"
    )
    notes = {r.note for r in s.sql("SELECT note FROM audit_log").collect()}
    assert "removed 1001" in notes and "checked" not in notes


def test_cluster_management_script_verbatim(spark, tmp_path):
    """The multi_cluster_management.sql shape end-to-end: register
    nodes, distribute + colocate tables, inspect pg_dist_* metadata,
    size relations, then isolate a tenant — every statement in the
    reference's own spelling through one session."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.sql("SELECT citus_set_coordinator_host('localhost')")
    s.sql("SELECT 1 FROM citus_add_node('localhost', 9701)")
    s.sql("SELECT 1 FROM citus_add_node('localhost', 9702)")

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    p = str(tmp_path / "ev")
    ev.write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("cm_events")
    s.sql(
        "SELECT create_distributed_table('cm_events', 'user_id', "
        "shard_count => 8)"
    )
    s.catalog.get("cm_events").path = p

    meta = s.sql(
        "SELECT p.partmethod, count(sh.shardid) AS shards, "
        "max(n.active_nodes) AS nodes "
        "FROM pg_dist_partition p "
        "JOIN pg_dist_shard sh ON p.logicalrelid = sh.logicalrelid "
        "CROSS JOIN (SELECT count(*) AS active_nodes FROM pg_dist_node "
        "            WHERE isactive) n "
        "WHERE p.logicalrelid = 'cm_events' "
        "GROUP BY p.partmethod"
    ).collect()[0]
    assert (meta.partmethod, meta.shards, meta.nodes) == ("h", 8, 2)

    pretty = s.sql(
        "SELECT pg_size_pretty(citus_table_size('cm_events'))"
    ).collect()[0][0]
    assert pretty.endswith((" bytes", " kB", " MB"))

    sid = s.sql(
        "SELECT isolate_tenant_to_new_shard('cm_events', 7)"
    ).collect()[0][0]
    shard_rows = {
        r.shardid: r.shard_rows
        for r in s.sql("SELECT * FROM citus_shards").collect()
    }
    tenant_n = s.sql(
        "SELECT count(*) AS n FROM cm_events WHERE user_id = 7"
    ).collect()[0].n
    assert shard_rows[sid] == tenant_n > 0


def test_citus_schema_migration_script_r7(spark):
    """A PG/Citus schema-migration script of the round-7 surface —
    referential actions, ALTER COLUMN TYPE, TRUNCATE CASCADE, shard
    split, restore-strategy metadata — pasted statement by statement,
    the way a user's migration file runs."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    script = [
        # schema with real constraints and actions
        "CREATE TABLE accounts (aid bigint PRIMARY KEY, name text, "
        "plan text DEFAULT 'free' CHECK (plan <> ''))",
        "CREATE TABLE projects (pid bigint PRIMARY KEY, "
        "aid bigint REFERENCES accounts (aid) ON DELETE CASCADE, "
        "budget text)",
        "CREATE TABLE tasks (tid bigint, "
        "pid bigint REFERENCES projects (pid) ON DELETE CASCADE "
        "ON UPDATE CASCADE, hours int)",
        # data
        "INSERT INTO accounts (aid, name) VALUES "
        "(1, 'acme'), (2, 'globex'), (3, 'initech')",
        "INSERT INTO projects VALUES (10, 1, '100.5'), (11, 1, '7'), "
        "(20, 2, '55'), (30, 3, '9')",
        "INSERT INTO tasks VALUES (100, 10, 5), (101, 10, 3), "
        "(110, 11, 2), (200, 20, 8), (300, 30, 1)",
        # the migration: budget was mistyped text → make it numeric
        "ALTER TABLE projects ALTER COLUMN budget TYPE double precision",
        # re-key a project: the task follows (ON UPDATE CASCADE)
        "UPDATE projects SET pid = 21 WHERE pid = 20",
        # drop a customer: projects AND tasks cascade away
        "DELETE FROM accounts WHERE aid = 1",
    ]
    for stmt in script:
        s.sql(stmt)
    assert {r.aid for r in spark.table("accounts").collect()} == {2, 3}
    assert {r.pid for r in spark.table("projects").collect()} == {21, 30}
    assert {(r.tid, r.pid) for r in spark.table("tasks").collect()} == {
        (200, 21), (300, 30),
    }
    assert dict(spark.table("projects").dtypes)["budget"] == "double"
    # reset the small tenant tables for the next phase
    s.sql("TRUNCATE accounts CASCADE")
    assert spark.table("tasks").count() == 0
    # constraint metadata survived the whole migration
    rows = {
        r.conname: r
        for r in s.sql(
            "SELECT conname, confdeltype, confupdtype FROM pg_constraint "
            "WHERE conrelid = 'tasks'"
        ).collect()
    }
    fk = rows["tasks_pid_fkey"]
    assert (fk.confdeltype, fk.confupdtype) == ("c", "c")
    for t in ("tasks", "projects", "accounts"):
        s.sql(f"DROP TABLE {t}")
