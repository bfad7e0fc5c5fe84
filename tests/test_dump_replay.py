"""End-to-end pg_dump replay (the r9 verdict's underlying concern
behind items #3-5): a representative pg_dump 16 output — preamble
set_config/SETs, schema + owners, serial-style sequence DDL with
::regclass defaults, COPY FROM stdin payloads, constraints, indexes,
triggers, grants — replays through session.sql to completion, with
sequence draws continuing correctly across INSERT and COPY."""

import pytest

from citus_spark.session import DistributedSession


DUMP = [
    "SET statement_timeout = 0",
    "SET lock_timeout = 0",
    "SET idle_in_transaction_session_timeout = 0",
    "SET client_encoding = 'UTF8'",
    "SET standard_conforming_strings = on",
    "SELECT pg_catalog.set_config('search_path', '', false)",
    "SET check_function_bodies = false",
    "SET xmloption = content",
    "SET client_min_messages = warning",
    "SET row_security = off",
    "SET default_tablespace = ''",
    "SET default_table_access_method = heap",
    "CREATE SCHEMA app",
    "ALTER SCHEMA app OWNER TO admin",
    "CREATE TABLE app.users (id bigint NOT NULL, email text, "
    "status text DEFAULT 'new', created timestamp without time zone)",
    "ALTER TABLE app.users OWNER TO admin",
    "CREATE SEQUENCE app.users_id_seq START WITH 1 INCREMENT BY 1 "
    "NO MINVALUE NO MAXVALUE CACHE 1",
    "ALTER SEQUENCE app.users_id_seq OWNED BY app.users.id",
    "ALTER TABLE ONLY app.users ALTER COLUMN id "
    "SET DEFAULT nextval('app.users_id_seq'::regclass)",
    "COPY app.users (id, email, status, created) FROM stdin;\n"
    "1\ta@x.com\tnew\t2024-01-01 00:00:00\n"
    "2\tb@y.org\tok\t2024-01-02 10:30:00\n\\.",
    "ALTER TABLE ONLY app.users ADD CONSTRAINT users_pkey "
    "PRIMARY KEY (id)",
    "CREATE INDEX users_email_idx ON app.users USING btree (email)",
    "CREATE TRIGGER users_audit AFTER INSERT OR UPDATE ON app.users "
    "FOR EACH ROW EXECUTE FUNCTION audit_fn()",
    "GRANT SELECT ON TABLE app.users TO reporting",
    "SELECT setval('app.users_id_seq', 2, true)",
]


def test_pg_dump_header_replays_to_completion(spark):
    s = DistributedSession(spark)
    for st in DUMP:
        s.sql(st)  # any raise fails the test with the statement
    # the serial default draws continue from setval across both the
    # INSERT path and the COPY path
    s.sql(
        "INSERT INTO app.users (email, status, created) VALUES "
        "('c@z.io', 'new', TIMESTAMP '2024-02-01 00:00:00')"
    )
    s.sql(
        "COPY app.users (email, status, created) FROM stdin;\n"
        "d@w.net\tok\t2024-03-01 00:00:00\n\\."
    )
    rows = [
        tuple(r) for r in s.sql(
            "SELECT id, email FROM app.users ORDER BY id"
        ).collect()
    ]
    assert rows == [
        (1, "a@x.com"), (2, "b@y.org"), (3, "c@z.io"), (4, "d@w.net"),
    ]
    # the trigger was recorded, never fired (status defaults intact)
    assert ("app__users", "users_audit") in s._triggers
    # RLS statements in a dump reject with the NAMED error, not a
    # parse failure — a caller can skip-and-continue deterministically
    with pytest.raises(NotImplementedError, match="row-level security"):
        s.sql("ALTER TABLE app.users ENABLE ROW LEVEL SECURITY")


def test_duplicate_and_missing_relation_trigger_errors(spark):
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS trg_dup_t")
    s.sql("CREATE TABLE trg_dup_t (a int)")
    s.sql(
        "CREATE TRIGGER t1 AFTER INSERT ON trg_dup_t "
        "FOR EACH ROW EXECUTE FUNCTION f()"
    )
    with pytest.raises(ValueError, match="already exists"):
        s.sql(
            "CREATE TRIGGER t1 AFTER INSERT ON trg_dup_t "
            "FOR EACH ROW EXECUTE FUNCTION f()"
        )
    with pytest.raises(ValueError, match="does not exist"):
        s.sql(
            "CREATE TRIGGER t2 AFTER INSERT ON no_such_relation_xyz "
            "FOR EACH ROW EXECUTE FUNCTION f()"
        )
    # DROP TABLE clears the trigger records: the recreated table
    # distributes (review fix — stale records blocked it forever)
    s.sql("DROP TABLE trg_dup_t")
    s.sql("CREATE TABLE trg_dup_t (a int)")
    s.sql("SELECT create_distributed_table('trg_dup_t', 'a')")


def test_public_schema_dump_shape(spark):
    """pg_dump of a default-schema database fully qualifies with
    public. after set_config('search_path','') — the bare-registered
    objects must still resolve (review fix: _seq_name missed the
    public-strips-to-bare rule)."""
    s = DistributedSession(spark)
    for st in (
        "SELECT pg_catalog.set_config('search_path', '', false)",
        "CREATE TABLE public.items (id bigint NOT NULL, name text)",
        "CREATE SEQUENCE public.items_id_seq",
        "ALTER SEQUENCE public.items_id_seq OWNED BY public.items.id",
        "ALTER TABLE ONLY public.items ALTER COLUMN id "
        "SET DEFAULT nextval('public.items_id_seq'::regclass)",
        "COPY public.items (id, name) FROM stdin;\n1\tfirst\n\\.",
        "SELECT pg_catalog.setval('public.items_id_seq', 1, true)",
        "ALTER FUNCTION public.audit_fn() OWNER TO admin",
    ):
        s.sql(st)
    # SHOW reports what was set — the empty preamble path verbatim
    assert s.sql("SHOW search_path").collect()[0][0] == ""
    # explicit DEFAULT keyword draws per row (was: raw nextval text
    # spliced into Spark SQL)
    s.sql("INSERT INTO items (id, name) VALUES (DEFAULT, 'second'), "
          "(DEFAULT, 'third')")
    rows = [
        tuple(r) for r in s.sql(
            "SELECT id, name FROM items ORDER BY id"
        ).collect()
    ]
    assert rows == [(1, "first"), (2, "second"), (3, "third")]
    # MERGE with a sequence DEFAULT rejects loudly, never silently
    import pytest as _pytest
    s.sql("CREATE TABLE items_src (name text)")
    s.sql("INSERT INTO items_src VALUES ('fourth')")
    with _pytest.raises(
        NotImplementedError, match="sequence values inside MERGE"
    ):
        s.sql(
            "MERGE INTO items t USING items_src s ON t.name = s.name "
            "WHEN NOT MATCHED THEN INSERT (id, name) "
            "VALUES (DEFAULT, s.name)"
        )


def test_pg16_dump_admin_tail_replays(spark):
    """The admin statements a PG 16 pg_dump appends after the data
    section (r11): publications, extended statistics, default
    privileges, replica identity, comments, setval — plus the psql
    session statements around a restore (CHECKPOINT, LISTEN,
    VACUUM (ANALYZE)). Every one must replay with no raw
    ParseException, and none may perturb the restored data."""
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    for st in (
        "SELECT pg_catalog.set_config('search_path', '', false)",
        "CREATE TABLE public.acct (id bigint NOT NULL, bal double precision)",
        "COPY public.acct (id, bal) FROM stdin;\n1\t10.5\n2\t20.25\n\\.",
        "COMMENT ON TABLE public.acct IS 'account balances'",
        "COMMENT ON COLUMN public.acct.bal IS 'current balance'",
        "ALTER TABLE ONLY public.acct REPLICA IDENTITY FULL",
        "CREATE STATISTICS public.acct_stats ON id, bal FROM public.acct",
        "CREATE PUBLICATION dump_pub FOR TABLE public.acct",
        "ALTER DEFAULT PRIVILEGES IN SCHEMA public "
        "GRANT SELECT ON TABLES TO readers",
        "GRANT SELECT ON TABLE public.acct TO readers",
        "CHECKPOINT",
        "LISTEN restore_done",
        "NOTIFY restore_done",
        "VACUUM (ANALYZE) acct",
        "UNLISTEN *",
    ):
        s.sql(st)
    rows = [
        tuple(r)
        for r in s.sql("SELECT id, bal FROM acct ORDER BY id").collect()
    ]
    assert rows == [(1, 10.5), (2, 20.25)]
