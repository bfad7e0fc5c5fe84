"""Textual DDL — the statements every reference tutorial opens with.

↔ reference flow (its docs and regress schedules):

    CREATE EXTENSION citus;
    CREATE TABLE companies (id bigint, name text, ...);
    SELECT create_distributed_table('companies', 'id');
    COPY companies FROM ...;
    CREATE INDEX ON companies (...);

Spark mapping: CREATE TABLE parses the column list into a Spark
schema (PG type names mapped below). PRIMARY KEY / UNIQUE /
REFERENCES / CHECK — inline or table-level — parse into the same op
tuples ALTER TABLE ADD CONSTRAINT produces and register as REAL
constraints (plans/constraints.py: distribution rules, distributed
validation, write-path enforcement); NOT NULL / DEFAULT remain
advisory on existing relations. CREATE TABLE materializes an EMPTY
parquet relation on
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

# TEMP/TEMPORARY/UNLOGGED prefixes accepted: every relation here is
# already session-scoped (temp views over scratch parquet), which IS
# PG's temp-table lifetime, and nothing is WAL-logged to begin with
_CREATE = re.compile(
    r"^\s*CREATE\s+(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+"
    r"|UNLOGGED\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\((?P<body>.*)\)\s*;?\s*$",
    re.I | re.S,
)
# the PARTITION BY suffix form is tried FIRST (a mandatory suffix
# forces the greedy body to backtrack to the right closing paren; an
# optional suffix would let the body swallow the partition clause)
_CREATE_PARTITIONED = re.compile(
    r"^\s*CREATE\s+(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+"
    r"|UNLOGGED\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\((?P<body>.*)\)\s*"
    r"PARTITION\s+BY\s+(?P<pmethod>RANGE|LIST|HASH)\s*"
    r"\(\s*(?P<pcol>[A-Za-z_]\w*)\s*\)\s*;?\s*$",
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
    r"|ALTER\s+ROLE\b.*|DROP\s+ROLE\b.*|ALTER\s+USER\b.*"
    r"|DROP\s+USER\b.*|COMMENT\s+ON\b.*"
    # role switching / ownership: no auth model (storage-layer
    # permissions govern); regress scripts SET ROLE around RLS and
    # ownership probes (multi_alter_table_row_level_security.sql)
    r"|SET\s+ROLE\b.*|RESET\s+ROLE"
    r"|ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:ONLY\s+)?[A-Za-z_][\w.]*"
    r"\s+OWNER\s+TO\b.*"
    # pg_dump always includes the argument signature on routines
    # (ALTER FUNCTION public.audit_fn() OWNER TO ..)
    r"|ALTER\s+(?:SCHEMA|SEQUENCE|VIEW|MATERIALIZED\s+VIEW|FUNCTION"
    r"|PROCEDURE|AGGREGATE|TYPE|DOMAIN|INDEX|COLLATION)"
    r"\s+[A-Za-z_][\w.]*\s*(?:\([^)]*\))?\s+OWNER\s+TO\b.*"
    # physical-maintenance statements with no analog here: parquet
    # relations have no indexes to rebuild or heap to re-order
    # (VACUUM's compaction analog IS implemented — see
    # _execute_utility); pg_dump/maintenance scripts emit these
    r"|REINDEX\b.*|CLUSTER\s+[A-Za-z_].*"
    # DROP INDEX is CREATE INDEX's no-op twin; LOCK acquires a lock
    # this single-session engine cannot contend on; DISCARD resets
    # psql session state that does not exist here
    r"|DROP\s+INDEX\b.*|LOCK\s+(?:TABLE\s+)?[A-Za-z_].*"
    r"|DISCARD\s+(?:ALL|PLANS|SEQUENCES|TEMP(?:ORARY)?))\s*;?\s*$",
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


def _map_type(pg_type: str, udts: dict[str, str] | None = None) -> str:
    t = re.sub(r"\s+", " ", pg_type.strip().lower())
    # digit-bearing names (int4, float8) are real PG type names; dots
    # admit schema-qualified user-defined type names
    base = re.match(
        r"([a-z][a-z0-9 ._]*?)\s*(?:\(([^)]*)\))?(\s*\[\s*\])?$", t
    )
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
    elif udts and (
        name in udts
        or name.replace("__", ".") in udts
        or name.split(".")[-1].split("__")[-1] in udts
    ):
        # session-registered ENUM / composite / DOMAIN (type_sql.py);
        # the dict value is the Spark storage type. The "__" spelling
        # is the session's schema-name mangling of sch.name.
        spark = (
            udts.get(name)
            or udts.get(name.replace("__", "."))
            or udts[name.split(".")[-1].split("__")[-1]]
        )
    else:
        raise ValueError(
            f"CREATE TABLE: unsupported PostgreSQL type {pg_type!r}"
        )
    return f"array<{spark}>" if is_array else spark


_ALTER = re.compile(
    # ONLY restricts to the parent relation — every relation here is
    # its own storage (partition children are separate catalog
    # entries), so the keyword strips; pg_dump emits it on every
    # ALTER TABLE ONLY .. ADD CONSTRAINT / SET DEFAULT
    r"^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:ONLY\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s+"
    r"(?P<action>.+?)\s*;?\s*$",
    re.I | re.S,
)


def parse_alter_table(sql: str, udts: dict[str, str] | None = None):
    """→ (table, op, args) for the supported ALTER TABLE actions:
    ('add', col, spark_type) / ('drop', col) / ('rename_col', a, b) /
    ('rename_table', new). None when not ALTER TABLE; raises on
    unsupported actions (fail loudly, never silently ignore a schema
    change)."""
    m = _ALTER.match(sql)
    if not m:
        return None
    name, action = m.group("name"), m.group("action").strip()
    # constraint actions first — the ADD-COLUMN regex would otherwise
    # read "ADD CONSTRAINT pos CHECK (..)" as a column named CONSTRAINT
    con = _parse_constraint_action(action)
    if con is not None:
        return name, con
    sd = re.match(
        r"ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+SET\s+DEFAULT\s+(.+)$",
        action, re.I | re.S,
    )
    if sd:
        return name, ("set_default", sd.group(1), sd.group(2).strip())
    dd = re.match(
        r"ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+DROP\s+DEFAULT$",
        action, re.I,
    )
    if dd:
        return name, ("drop_default", dd.group(1))
    snn = re.match(
        r"ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+SET\s+NOT\s+NULL$",
        action, re.I,
    )
    if snn:
        return name, ("set_not_null", snn.group(1))
    dnn = re.match(
        r"ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+DROP\s+NOT\s+NULL$",
        action, re.I,
    )
    if dnn:
        return name, ("drop_not_null", dnn.group(1))
    gm = re.match(
        r"ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_]\w*)\s+(.+)$",
        action, re.I | re.S,
    )
    if gm and _GENERATED_EXPR.search(_mask_literals(gm.group(2))):
        # ADD COLUMN .. GENERATED ALWAYS AS (expr) STORED — existing
        # rows compute immediately (PG back-fills stored generated
        # columns on ADD)
        gexpr = _generated_of(f"{gm.group(1)} {gm.group(2)}")
        tm = re.search(
            r"\bGENERATED\b", _mask_literals(gm.group(2)), re.I
        )
        # column constraints may sit between the type and GENERATED
        # (PG accepts any order) — strip them from the type slice
        type_txt = gm.group(2)[: tm.start()].strip()
        while True:
            stripped = re.sub(
                r"\s+(NOT\s+NULL|NULL|UNIQUE|PRIMARY\s+KEY)\s*$",
                "", type_txt, flags=re.I,
            )
            if stripped == type_txt:
                break
            type_txt = stripped
        return name, (
            "add_generated",
            gm.group(1),
            _map_type(type_txt, udts),
            gexpr,
        )
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
            "add", am.group(1), _map_type(am.group(2), udts),
            am.group(3).strip() if am.group(3) else None,
        )
    dm = re.match(
        r"DROP\s+(?:COLUMN\s+)?(?P<ie>IF\s+EXISTS\s+)?([A-Za-z_]\w*)"
        r"\s*(?:CASCADE|RESTRICT)?$",
        action, re.I,
    )
    if dm:
        if dm.group("ie"):
            return name, ("drop_if_exists", dm.group(2))
        return name, ("drop", dm.group(2))
    rm = re.match(
        r"RENAME\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)$",
        action, re.I,
    )
    if rm:
        return name, ("rename_col", rm.group(1), rm.group(2))
    rt = re.match(r"RENAME\s+TO\s+([A-Za-z_]\w*)$", action, re.I)
    if rt:
        return name, ("rename_table", rt.group(1))
    # physical/ownership knobs with no analog on parquet relations —
    # pg_dump emits these for any table with non-default settings, so
    # a dump replay must accept them (recorded no-ops, like GRANT)
    if re.match(
        r"(OWNER\s+TO\s+\S+"
        r"|ALTER\s+(?:COLUMN\s+)?[A-Za-z_]\w*\s+SET\s+STORAGE\s+\w+"
        r"|ALTER\s+(?:COLUMN\s+)?[A-Za-z_]\w*\s+SET\s+STATISTICS\s+-?\d+"
        r"|SET\s+\(.*\)"
        r"|RESET\s+\(.*\)"
        # logical-replication row identity (no replication consumer
        # here) and physical clustering order (parquet layout is the
        # engine's own) — pg_dump emits both when non-default
        r"|REPLICA\s+IDENTITY\s+(?:DEFAULT|FULL|NOTHING"
        r"|USING\s+INDEX\s+\S+)"
        r"|CLUSTER\s+ON\s+\S+"
        r"|SET\s+WITHOUT\s+CLUSTER)$",
        action, re.I | re.S,
    ):
        return name, ("noop_metadata", action)
    at = re.match(
        r"ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+(?:SET\s+DATA\s+)?"
        r"TYPE\s+(.+?)(?:\s+USING\s+(.+))?$",
        action, re.I | re.S,
    )
    if at:
        # ↔ reference commands/alter_table.c (type changes propagate
        # through the DDL machinery); executed here as a
        # rewrite-with-cast through the copy-on-write path
        return name, (
            "alter_type", at.group(1), _map_type(at.group(2), udts),
            at.group(3).strip() if at.group(3) else None,
        )
    raise NotImplementedError(
        f"ALTER TABLE: unsupported action {action[:60]!r} (supported: "
        "ADD/DROP/RENAME COLUMN, ADD COLUMN .. GENERATED .. STORED, "
        "ALTER COLUMN TYPE [USING], ALTER COLUMN SET/DROP DEFAULT, "
        "ALTER COLUMN SET/DROP NOT NULL, RENAME TO, "
        "ADD/DROP/VALIDATE CONSTRAINT)"
    )


def _cols(text: str) -> list[str]:
    return [c.strip() for c in text.split(",")]


def _mask_literals(text: str) -> str:
    """Same-length copy with string literals and comments blanked, so
    keyword regexes never match inside a DEFAULT like 'REFERENCES x'
    and paren counting ignores a CHECK (status <> ':-)')."""
    from citus_spark.plans.rewrites import _segments

    return "".join(
        t if k == "code" else " " * len(t) for k, t in _segments(text)
    )


# PG pg_constraint confdeltype/confupdtype codes
_REF_ACTIONS = {
    "NO ACTION": "a", "RESTRICT": "r", "CASCADE": "c",
    "SET NULL": "n", "SET DEFAULT": "d",
}


def _parse_ref_actions(acts: str) -> tuple[str, str]:
    """'ON DELETE CASCADE ON UPDATE SET NULL' → (confdeltype,
    confupdtype) codes; unspecified → 'a' (NO ACTION), PG's default."""
    on_delete = on_update = "a"
    for m in re.finditer(
        r"ON\s+(DELETE|UPDATE)\s+"
        r"(NO\s+ACTION|RESTRICT|CASCADE|SET\s+NULL|SET\s+DEFAULT)",
        acts or "", re.I,
    ):
        code = _REF_ACTIONS[re.sub(r"\s+", " ", m.group(2).upper())]
        if m.group(1).upper() == "DELETE":
            on_delete = code
        else:
            on_update = code
    return on_delete, on_update


def _parse_constraint_action(action: str):
    """Constraint actions (↔ reference foreign_constraint.c /
    relation DDL propagation). Referential actions CASCADE /
    SET NULL / SET DEFAULT parse into PG's confdeltype codes and are
    executed by the cascade engine in plans/constraints.py."""
    fk = re.match(
        r"ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+FOREIGN\s+KEY\s*"
        r"\(([^)]+)\)\s*REFERENCES\s+([A-Za-z_][\w.]*)\s*"
        r"(?:\(([^)]+)\))?\s*(?P<act>(?:ON\s+(?:DELETE|UPDATE)\s+"
        r"(?:NO\s+ACTION|RESTRICT|CASCADE|SET\s+NULL|SET\s+DEFAULT)\s*)*)"
        r"(?P<nv>NOT\s+VALID)?$",
        action, re.I,
    )
    if fk:
        on_delete, on_update = _parse_ref_actions(fk.group("act"))
        return (
            "add_fk",
            fk.group(1),
            _cols(fk.group(2)),
            fk.group(3),
            _cols(fk.group(4)) if fk.group(4) else None,
            bool(fk.group("nv")),
            on_delete,
            on_update,
        )
    ex = re.match(
        r"ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+EXCLUDE\s*"
        r"(?:USING\s+([A-Za-z_]\w*)\s*)?"
        r"\((?P<body>.+)\)\s*(?P<nv>NOT\s+VALID)?$",
        action, re.I | re.S,
    )
    if ex:
        elems = []
        for part in ex.group("body").split(","):
            em = re.match(
                r"^\s*([A-Za-z_]\w*)\s+WITH\s+(=|&&)\s*$", part, re.I
            )
            if not em:
                raise NotImplementedError(
                    "EXCLUDE elements must be '<column> WITH =' or "
                    f"'<column> WITH &&'; got {part.strip()!r}"
                )
            elems.append((em.group(1), em.group(2)))
        if not elems:
            raise ValueError("EXCLUDE constraint needs at least one element")
        return (
            "add_exclude",
            ex.group(1),
            (ex.group(2) or "btree").lower(),
            elems,
            bool(ex.group("nv")),
        )
    uq = re.match(
        r"ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+"
        r"(UNIQUE|PRIMARY\s+KEY)\s*\(([^)]+)\)$",
        action, re.I,
    )
    if uq:
        kind = "p" if uq.group(2).upper().startswith("PRIMARY") else "u"
        return ("add_unique", uq.group(1), kind, _cols(uq.group(3)))
    ck = re.match(
        r"ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*\((?P<expr>.+)\)\s*"
        r"(?P<nv>NOT\s+VALID)?$",
        action, re.I | re.S,
    )
    if ck:
        expr = ck.group("expr").strip()
        masked = _mask_literals(expr)
        if masked.count("(") != masked.count(")"):
            # the greedy group swallowed the trailing NOT VALID paren
            # mismatch — reparse is not worth it; reject loudly
            # (parens inside string literals are masked out first, so
            # CHECK (status <> ':-)') balances correctly)
            raise ValueError(f"CHECK expression unbalanced: {expr!r}")
        return ("add_check", ck.group(1), expr, bool(ck.group("nv")))
    dc = re.match(
        r"DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)"
        r"\s*(?:CASCADE|RESTRICT)?$",
        action, re.I,
    )
    if dc:
        return ("drop_constraint", dc.group(2), bool(dc.group(1)))
    vc = re.match(r"VALIDATE\s+CONSTRAINT\s+([A-Za-z_]\w*)$", action, re.I)
    if vc:
        return ("validate_constraint", vc.group(1))
    return None


def _suffix_name(base: str, taken) -> str:
    """PG's collision rule for generated names: base, base1, base2…"""
    name, i = base, 0
    while name in taken:
        i += 1
        name = f"{base}{i}"
    return name


def _default_conname(table: str, op: tuple, taken=()) -> str:
    """PG's auto-generated constraint names; a taken name gets a
    numeric suffix the way PG names a second unnamed CHECK
    '{table}_check1'."""
    if op[0] == "add_unique":
        base = (
            f"{table}_pkey" if op[2] == "p"
            else f"{table}_{'_'.join(op[3])}_key"
        )
    elif op[0] == "add_fk":
        base = f"{table}_{op[2][0]}_fkey"
    elif op[0] == "add_exclude":
        # PG names exclusion constraints {table}_{firstcol}_excl
        base = f"{table}_{op[3][0][0]}_excl"
    else:
        base = f"{table}_check"
    return _suffix_name(base, taken)


def _table_constraint_op(table: str, item: str, taken=()):
    """A table-level constraint item from a CREATE TABLE column list →
    the same op tuple ALTER TABLE ADD CONSTRAINT produces."""
    item = item.strip().rstrip(",")
    cn = re.match(r"CONSTRAINT\s+([A-Za-z_]\w*)\s+(.+)$", item, re.I | re.S)
    name, rest = (cn.group(1), cn.group(2)) if cn else (None, item)
    op = _parse_constraint_action(
        f"ADD CONSTRAINT {name or '__tmp__'} {rest.strip()}"
    )
    if op is None:
        raise ValueError(
            f"CREATE TABLE: cannot parse table constraint {item!r}"
        )
    if name is None:
        op = (op[0], _default_conname(table, op, taken)) + op[2:]
    return op


def _balanced_paren_body(text: str, open_idx: int) -> str:
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i]
    raise ValueError(f"unbalanced parentheses in {text!r}")


def _column_constraint_ops(
    table: str, col: str, item: str, taken=()
) -> list[tuple]:
    """Column-level PRIMARY KEY / UNIQUE / REFERENCES / CHECK /
    NOT NULL attributes → op tuples. Inline NOT NULL records the same
    enforcing {table}_{col}_not_null CHECK that ALTER COLUMN SET NOT
    NULL creates (PG enforces it from declaration, and PG 17 exposes
    it in pg_constraint under exactly that name) — every write path
    re-judges CHECKs, so a NULL insert rejects like PG instead of
    loading silently. Keyword regexes run over a literal-masked copy
    so a DEFAULT like 'see REFERENCES t(x)' never fabricates a
    phantom constraint."""
    ops: list[tuple] = []
    masked = _mask_literals(item)
    # search a paren-blanked copy: `CHECK (x IS NOT NULL OR ..)` must
    # not fabricate a column NOT NULL
    unparen = []
    depth = 0
    for ch in masked:
        depth += ch == "("
        unparen.append(ch if depth == 0 else " ")
        depth -= ch == ")"
    if re.search(r"\bNOT\s+NULL\b", "".join(unparen), re.I):
        ops.append((
            "add_check",
            _suffix_name(f"{table}_{col}_not_null", taken),
            f"{col} IS NOT NULL", False,
        ))
    if re.search(r"\bPRIMARY\s+KEY\b", masked, re.I):
        ops.append(("add_unique", f"{table}_pkey", "p", [col]))
    elif re.search(r"\bUNIQUE\b", masked, re.I):
        ops.append((
            "add_unique",
            _default_conname(table, ("add_unique", None, "u", [col]), taken),
            "u", [col],
        ))
    fk = re.search(
        r"\bREFERENCES\s+([A-Za-z_][\w.]*)\s*(?:\(([^)]+)\))?"
        r"(?P<act>(?:\s*ON\s+(?:DELETE|UPDATE)\s+"
        r"(?:NO\s+ACTION|RESTRICT|CASCADE|SET\s+NULL|SET\s+DEFAULT))*)",
        masked, re.I,
    )
    if fk:
        on_delete, on_update = _parse_ref_actions(fk.group("act"))
        ops.append((
            "add_fk",
            _default_conname(
                table, ("add_fk", None, [col]), taken
            ),
            [col], fk.group(1),
            _cols(fk.group(2)) if fk.group(2) else None, False,
            on_delete, on_update,
        ))
    ck = re.search(r"\bCHECK\s*\(", masked, re.I)
    if ck:
        # depth-count on the masked copy (literal parens are blanked),
        # slice the expression span from the original text
        open_idx = masked.index("(", ck.start())
        body = _balanced_paren_body(masked, open_idx)
        expr = item[open_idx + 1 : open_idx + 1 + len(body)]
        ops.append((
            "add_check",
            _suffix_name(f"{table}_{col}_check", taken),
            expr.strip(), False,
        ))
    return ops


def _column_default(item: str) -> str | None:
    """The DEFAULT expression of one column item, or None. Found over
    a literal-masked copy (a text default containing the word DEFAULT
    never confuses it); the expression ends at the next constraint
    keyword outside literals/parens."""
    masked = _mask_literals(item)
    m = re.search(r"\bDEFAULT\b", masked, re.I)
    if not m:
        return None
    # skip whitespace in the ORIGINAL text — a masked literal is all
    # blanks, so \s+ over `masked` would swallow the value itself
    start = m.end()
    while start < len(item) and item[start].isspace():
        start += 1
    stop = re.compile(
        r"\b(NOT\s+NULL|NULL|UNIQUE|PRIMARY\s+KEY|REFERENCES|CHECK"
        r"|GENERATED|CONSTRAINT)\b",
        re.I,
    )
    depth = 0
    i = start
    end = len(item)
    while i < len(masked):
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            sm = stop.match(masked, i)
            if sm:
                end = i
                break
        i += 1
    expr = item[start:end].strip()
    return expr or None


_GENERATED_EXPR = re.compile(
    r"\bGENERATED\s+ALWAYS\s+AS\s*\(", re.I
)


def _generated_of(item: str) -> str | None:
    """`col type GENERATED ALWAYS AS (expr) STORED` → expr (balanced,
    literal-masked). PG requires STORED; anything else after the
    closing paren rejects loudly (a silently NULL-filled generated
    column is wrong data). Distinct from GENERATED .. AS IDENTITY —
    that form has no parenthesized expression after AS."""
    masked = _mask_literals(item)
    m = _GENERATED_EXPR.search(masked)
    if m is None:
        return None
    # depth-count over the MASKED copy (a paren inside a string
    # literal must not move the scan), then slice the ORIGINAL —
    # masking is length-preserving, so the indices line up
    masked_body = _balanced_paren_body(masked, m.end() - 1)
    open_idx = m.end() - 1
    body = item[open_idx + 1 : open_idx + 1 + len(masked_body)]
    tail = masked[open_idx + 1 + len(masked_body) + 1 :].strip()
    if not re.match(r"STORED\b", tail, re.I):
        raise NotImplementedError(
            "GENERATED ALWAYS AS (expr) requires STORED (virtual "
            "generated columns are not supported)"
        )
    return body.strip()


def check_generated_refs(generated: dict, col: str, expr: str) -> None:
    """PG rule shared by CREATE TABLE and ADD COLUMN: a generated
    expression may not reference a generated column — itself
    included (masked-literal word-boundary scan)."""
    masked = _mask_literals(expr)
    for other in generated:
        if re.search(rf"\b{re.escape(other)}\b", masked):
            raise ValueError(
                f'generated column "{col}" cannot reference '
                + (
                    "itself"
                    if other == col
                    else f'another generated column "{other}"'
                )
            )


def parse_create_table(sql: str, udts: dict[str, str] | None = None):
    """→ (table, spark-DDL schema string, if_not_exists,
    [(identity_col, explicit_seq|None, opts_dict), ...],
    [constraint op tuples], {col: default_expr},
    {col: generated_expr}), or None."""
    from citus_spark.plans.sequence_sql import identity_of

    oc = re.search(
        r"\bON\s+COMMIT\s+(PRESERVE\s+ROWS|DROP|DELETE\s+ROWS)\s*;?\s*$",
        sql, re.I,
    )
    if oc is not None and re.match(r"\s*CREATE\b", sql, re.I):
        if not oc.group(1).upper().startswith("PRESERVE"):
            # autocommit engine: DROP/DELETE ROWS at commit would fire
            # after every statement — the table would be useless;
            # reject rather than silently keep the rows
            raise NotImplementedError(
                "CREATE TEMP TABLE .. ON COMMIT "
                f"{oc.group(1).upper()} is not supported (autocommit "
                "semantics; ON COMMIT PRESERVE ROWS is the behavior "
                "here)"
            )
        sql = sql[: oc.start()]  # PRESERVE ROWS is PG's default
    m = _CREATE_PARTITIONED.match(sql) or _CREATE.match(sql)
    if not m:
        return None
    table = m.group("name")
    cols = []
    identities: list[tuple] = []
    con_ops: list[tuple] = []
    taken: set[str] = set()
    defaults: dict[str, str] = {}
    generated: dict[str, str] = {}
    for item in _split_columns(m.group("body")):
        if _TABLE_CONSTRAINT.match(item):
            op = _table_constraint_op(table, item, taken)
            taken.add(op[1])
            con_ops.append(op)
            continue
        gen = _generated_of(item)
        ident = identity_of(item) if gen is None else None
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
        cols.append(f"{cm.group(1)} {_map_type(cm.group(2), udts)}")
        if gen is not None:
            generated[cm.group(1)] = gen
        dflt = _column_default(item)
        if dflt is not None and ident is None and gen is None:
            defaults[cm.group(1)] = dflt
        for op in _column_constraint_ops(table, cm.group(1), item, taken):
            taken.add(op[1])
            con_ops.append(op)
    # PG: a generated column cannot reference a generated column —
    # including ITSELF (a self-reference would compute NULL forever
    # and break the recompute pass's idempotency invariant)
    for c, expr in generated.items():
        check_generated_refs(generated, c, expr)
    if not cols:
        raise ValueError("CREATE TABLE: no columns")
    ine = bool(re.search(r"IF\s+NOT\s+EXISTS", sql, re.I))
    partition_by = None
    if m.re is _CREATE_PARTITIONED:
        pcol = m.group("pcol")
        if not any(
            c.split(" ", 1)[0].lower() == pcol.lower() for c in cols
        ):
            raise ValueError(
                f'PARTITION BY column "{pcol}" is not a column of '
                f'"{table}" (expression partition keys are not '
                "supported — partition on a stored column)"
            )
        partition_by = {
            "method": m.group("pmethod").lower(),
            "col": pcol,
        }
    return (
        table, ", ".join(cols), ine, identities, con_ops, defaults,
        generated, partition_by,
    )


# ---------------------------------------------------------------------------
# PG declarative partitioning DDL (↔ reference
# src/test/regress/sql/multi_partitioning.sql:16-40,116,292-311 and
# src/backend/distributed/operations/partitioning support): a
# partitioned parent stores no rows; children carry bounds; writes to
# the parent route by bound. Spark-first mapping in session.py — the
# parent relation is the union of its children's parquet layouts.

_PARTITION_OF = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<child>[A-Za-z_][\w.]*)\s+PARTITION\s+OF\s+"
    r"(?P<parent>[A-Za-z_][\w.]*)\s+"
    r"(?:DEFAULT|FOR\s+VALUES\s+(?P<bound>.+?))\s*;?\s*$",
    re.I | re.S,
)
_ATTACH = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<parent>[A-Za-z_][\w.]*)\s+"
    r"ATTACH\s+PARTITION\s+(?P<child>[A-Za-z_][\w.]*)\s+"
    r"(?:DEFAULT|FOR\s+VALUES\s+(?P<bound>.+?))\s*;?\s*$",
    re.I | re.S,
)
_DETACH = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<parent>[A-Za-z_][\w.]*)\s+"
    r"DETACH\s+PARTITION\s+(?P<child>[A-Za-z_][\w.]*)"
    r"(?:\s+CONCURRENTLY|\s+FINALIZE)?\s*;?\s*$",
    re.I,
)
_BOUND_RANGE = re.compile(
    r"^FROM\s*\((?P<lo>.+?)\)\s*TO\s*\((?P<hi>.+?)\)$", re.I | re.S
)
_BOUND_LIST = re.compile(r"^IN\s*\((?P<vals>.+)\)$", re.I | re.S)
_BOUND_HASH = re.compile(
    r"^WITH\s*\(\s*MODULUS\s+(?P<m>\d+)\s*,\s*"
    r"REMAINDER\s+(?P<r>\d+)\s*\)$",
    re.I,
)


def parse_partition_bound(text: str | None) -> dict:
    """FOR VALUES clause text → bound dict:
    {"kind": "range", "lo": lit|None, "hi": lit|None} (None =
    MINVALUE/MAXVALUE), {"kind": "list", "in": [lits],
    "has_null": bool}, {"kind": "hash", "modulus": m, "remainder": r},
    or {"kind": "default"} when the clause is the DEFAULT keyword
    (text None). Multi-column range bounds are rejected loudly."""
    if text is None:
        return {"kind": "default"}
    text = text.strip()
    m = _BOUND_RANGE.match(text)
    if m:
        lo, hi = m.group("lo").strip(), m.group("hi").strip()
        if "," in lo or "," in hi:
            raise ValueError(
                "multi-column range partition bounds are not "
                "supported — partition on a single column"
            )
        return {
            "kind": "range",
            "lo": None if lo.upper() == "MINVALUE" else lo,
            "hi": None if hi.upper() == "MAXVALUE" else hi,
        }
    m = _BOUND_LIST.match(text)
    if m:
        vals = [v.strip() for v in _split_columns(m.group("vals"))]
        has_null = any(v.upper() == "NULL" for v in vals)
        return {
            "kind": "list",
            "in": [v for v in vals if v.upper() != "NULL"],
            "has_null": has_null,
        }
    m = _BOUND_HASH.match(text)
    if m:
        mod, rem = int(m.group("m")), int(m.group("r"))
        if mod <= 0 or not 0 <= rem < mod:
            raise ValueError(
                f"hash partition bound MODULUS {mod} REMAINDER {rem} "
                "is invalid (need 0 <= remainder < modulus)"
            )
        return {"kind": "hash", "modulus": mod, "remainder": rem}
    raise ValueError(f"cannot parse partition bound {text!r}")


def parse_create_partition_of(sql: str):
    """→ (child, parent, bound_dict, if_not_exists) or None."""
    m = _PARTITION_OF.match(sql)
    if m is None:
        return None
    return (
        m.group("child"),
        m.group("parent"),
        parse_partition_bound(m.group("bound")),
        bool(m.group("ine")),
    )


def parse_attach_partition(sql: str):
    """→ (parent, child, bound_dict) or None."""
    m = _ATTACH.match(sql)
    if m is None:
        return None
    return (
        m.group("parent"),
        m.group("child"),
        parse_partition_bound(m.group("bound")),
    )


def parse_detach_partition(sql: str):
    """→ (parent, child) or None."""
    m = _DETACH.match(sql)
    if m is None:
        return None
    return m.group("parent"), m.group("child")


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
