"""Textual DDL — the statements every reference tutorial opens with.

↔ reference flow (its docs and regress schedules):

    CREATE EXTENSION citus;
    CREATE TABLE companies (id bigint, name text, ...);
    SELECT create_distributed_table('companies', 'id');
    COPY companies FROM ...;
    CREATE INDEX ON companies (...);

Spark mapping: CREATE TABLE parses the column list into a Spark
schema (PG type names mapped below; constraints like PRIMARY KEY /
NOT NULL / DEFAULT are accepted and recorded as advisory — Spark
enforces none of them, same as the reference's shards ultimately
trusting the coordinator), materializes an EMPTY parquet relation on
writable storage, and registers it in the catalog so COPY / INSERT /
create_distributed_table compose. DROP TABLE removes the view and
catalog entry. CREATE EXTENSION citus, CREATE INDEX, and bare
transaction-control statements (BEGIN/COMMIT/ROLLBACK/END) are
accepted as no-ops with an informational result — indexes have no
Spark analog (parquet stats + pruning play that role) and autocommit
is the storage layer's semantics (txlog provides real transactions).
"""

from __future__ import annotations

import re

# PG type name → Spark DDL type. varchar(n)/char(n) lose their length
# (Spark strings are unbounded — a superset, like the reference's
# text). numeric defaults to a wide decimal when unparameterized.
_TYPE_MAP = {
    "smallint": "smallint", "int2": "smallint",
    "integer": "int", "int": "int", "int4": "int",
    "bigint": "bigint", "int8": "bigint", "bigserial": "bigint",
    "serial": "int",
    "real": "float", "float4": "float",
    "double precision": "double", "float8": "double",
    "text": "string", "varchar": "string", "char": "string",
    "character varying": "string", "character": "string",
    "name": "string", "uuid": "string",
    "json": "string", "jsonb": "string",
    "bytea": "binary",
    "boolean": "boolean", "bool": "boolean",
    "date": "date",
    "timestamp": "timestamp", "timestamptz": "timestamp",
    "timestamp without time zone": "timestamp",
    "timestamp with time zone": "timestamp",
    "numeric": "decimal(38,18)", "decimal": "decimal(38,18)",
    "money": "decimal(19,4)",
    # PG float (= float8) and interval (a valid Spark cast target)
    "float": "double", "interval": "interval",
    # Spark-native spellings pass through: a PREPARE/CREATE may carry
    # either dialect's names (double/string/long are not PG types)
    "double": "double", "string": "string", "long": "bigint",
    "short": "smallint", "tinyint": "tinyint", "binary": "binary",
}

_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\((?P<body>.*)\)\s*;?\s*$",
    re.I | re.S,
)
_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_NOOP = re.compile(
    r"^\s*(CREATE\s+EXTENSION\b.*|CREATE\s+(?:UNIQUE\s+)?INDEX\b.*"
    r"|BEGIN|START\s+TRANSACTION|COMMIT|END|ROLLBACK"
    # access control is out of the engine's scope (no auth model —
    # storage-layer permissions govern); reference tutorials and
    # regress scripts GRANT/REVOKE freely, so accept-and-report
    r"|GRANT\b.*|REVOKE\b.*|CREATE\s+ROLE\b.*|CREATE\s+USER\b.*"
    r"|ALTER\s+ROLE\b.*|COMMENT\s+ON\b.*)\s*;?\s*$",
    re.I | re.S,
)

_TABLE_CONSTRAINT = re.compile(
    r"^\s*(PRIMARY\s+KEY|UNIQUE|CHECK|FOREIGN\s+KEY|CONSTRAINT|EXCLUDE)\b",
    re.I,
)


def parse_noop(sql: str) -> str | None:
    """→ a short tag for accepted-as-no-op statements, else None."""
    m = _NOOP.match(sql)
    if not m:
        return None
    head = re.sub(r"\s+", " ", m.group(1).strip()).upper()
    return head.split(" ")[1] if head.startswith("CREATE") else head


def parse_drop_table(sql: str) -> tuple[str, bool] | None:
    m = _DROP.match(sql)
    if not m:
        return None
    return m.group("name"), bool(m.group("ine"))


def _split_columns(body: str) -> list[str]:
    from citus_spark.plans.rewrites import _split_top_level

    return _split_top_level(body)


def _map_type(pg_type: str) -> str:
    t = re.sub(r"\s+", " ", pg_type.strip().lower())
    # digit-bearing names (int4, float8) are real PG type names
    base = re.match(r"([a-z][a-z0-9 ]*?)\s*(?:\(([^)]*)\))?(\s*\[\s*\])?$", t)
    if not base:
        raise ValueError(f"CREATE TABLE: cannot parse type {pg_type!r}")
    name = base.group(1).strip()
    args, is_array = base.group(2), bool(base.group(3))
    if name in ("numeric", "decimal") and args:
        parts = [a.strip() for a in args.split(",")]
        p = int(parts[0])
        s = int(parts[1]) if len(parts) > 1 else 0
        spark = f"decimal({p},{s})"
    elif name in _TYPE_MAP:
        spark = _TYPE_MAP[name]
    else:
        raise ValueError(
            f"CREATE TABLE: unsupported PostgreSQL type {pg_type!r}"
        )
    return f"array<{spark}>" if is_array else spark


_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>[A-Za-z_][\w.]*)\s+"
    r"(?P<action>.+?)\s*;?\s*$",
    re.I | re.S,
)


def parse_alter_table(sql: str):
    """→ (table, op, args) for the supported ALTER TABLE actions:
    ('add', col, spark_type) / ('drop', col) / ('rename_col', a, b) /
    ('rename_table', new). None when not ALTER TABLE; raises on
    unsupported actions (fail loudly, never silently ignore a schema
    change)."""
    m = _ALTER.match(sql)
    if not m:
        return None
    name, action = m.group("name"), m.group("action").strip()
    am = re.match(
        r"ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_]\w*)\s+(.+?)"
        r"(?:\s+NOT\s+NULL|\s+NULL)?(?:\s+DEFAULT\s+(.+?))?"
        r"(?:\s+NOT\s+NULL|\s+NULL)?$",
        action, re.I | re.S,
    )
    if am:
        # the DEFAULT expression back-fills existing rows, matching
        # PG's semantics (silently NULL-filling instead would diverge
        # aggregates on tutorial scripts)
        return name, (
            "add", am.group(1), _map_type(am.group(2)),
            am.group(3).strip() if am.group(3) else None,
        )
    dm = re.match(
        r"DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)"
        r"\s*(?:CASCADE|RESTRICT)?$",
        action, re.I,
    )
    if dm:
        return name, ("drop", dm.group(1))
    rm = re.match(
        r"RENAME\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)$",
        action, re.I,
    )
    if rm:
        return name, ("rename_col", rm.group(1), rm.group(2))
    rt = re.match(r"RENAME\s+TO\s+([A-Za-z_]\w*)$", action, re.I)
    if rt:
        return name, ("rename_table", rt.group(1))
    raise NotImplementedError(
        f"ALTER TABLE: unsupported action {action[:60]!r} (supported: "
        "ADD/DROP/RENAME COLUMN, RENAME TO)"
    )


def parse_create_table(sql: str):
    """→ (table, spark-DDL schema string, if_not_exists,
    [(identity_col, explicit_seq|None, start, inc), ...]), or None."""
    from citus_spark.plans.sequence_sql import identity_of

    m = _CREATE.match(sql)
    if not m:
        return None
    cols = []
    identities: list[tuple[str, str | None, int, int]] = []
    for item in _split_columns(m.group("body")):
        if _TABLE_CONSTRAINT.match(item):
            continue  # advisory in this engine (see module docstring)
        ident = identity_of(item)
        if ident is not None:
            identities.append(ident)
        cm = re.match(
            r"^([A-Za-z_]\w*)\s+(.+?)"
            r"(?:\s+(?:PRIMARY\s+KEY|NOT\s+NULL|NULL|UNIQUE|DEFAULT\s+.+"
            r"|REFERENCES\s+.+|CHECK\s*\(.+\)|GENERATED\s+.+))*\s*$",
            item,
            re.I | re.S,
        )
        if not cm:
            raise ValueError(f"CREATE TABLE: cannot parse column {item!r}")
        cols.append(f"{cm.group(1)} {_map_type(cm.group(2))}")
    if not cols:
        raise ValueError("CREATE TABLE: no columns")
    ine = bool(re.search(r"IF\s+NOT\s+EXISTS", sql, re.I))
    return m.group("name"), ", ".join(cols), ine, identities


# ---------------------------------------------------------------------------
# Views (↔ reference src/test/regress/sql/multi_view.sql /
# materialized_view.sql — Citus treats a view over distributed tables
# as a macro expanded at plan time, and a materialized view as a
# LOCAL table populated by its defining query; the analogs here are a
# late-bound temp view re-registered per statement, and a parquet
# materialization refreshed on command).
_CREATE_VIEW = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?(?P<mat>MATERIALIZED\s+)?"
    r"VIEW\s+(?P<name>[A-Za-z_][\w.]*)\s+AS\s+(?P<body>.+?)\s*"
    r"(?:WITH\s+(?:NO\s+)?DATA\s*)?;?\s*$",
    re.I | re.S,
)
_DROP_VIEW = re.compile(
    r"^\s*DROP\s+(?P<mat>MATERIALIZED\s+)?VIEW\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_REFRESH_MATVIEW = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?:CONCURRENTLY\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*;?\s*$",
    re.I,
)


def parse_create_view(sql: str):
    """(name, or_replace, materialized, body, with_no_data) or None."""
    m = _CREATE_VIEW.match(sql)
    if m is None:
        return None
    no_data = bool(
        re.search(r"WITH\s+NO\s+DATA\s*;?\s*$", sql, re.I)
    )
    return (
        m.group("name"),
        bool(m.group("replace")),
        bool(m.group("mat")),
        m.group("body").strip(),
        no_data,
    )


def parse_drop_view(sql: str):
    """(name, if_exists, materialized) or None."""
    m = _DROP_VIEW.match(sql)
    if m is None:
        return None
    return m.group("name"), bool(m.group("ine")), bool(m.group("mat"))


def parse_refresh_matview(sql: str) -> str | None:
    m = _REFRESH_MATVIEW.match(sql)
    return m.group("name") if m else None
