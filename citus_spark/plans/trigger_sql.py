"""Trigger, collation, and row-level-security DDL — the perimeter
statements almost every pg_dump contains (r9 verdict items #3-5: a
replayed dump must not die with a raw parser error at the first
CREATE TRIGGER).

↔ reference behavior (exact parity where the reference takes a
position):

- Triggers: commands/trigger.c:692,697 ERRORs "triggers are not
  supported on reference tables" / "... distributed tables" for every
  trigger command (CREATE/ALTER/DROP TRIGGER, ALTER TABLE
  EN/DISABLE TRIGGER) against a citus table while
  citus.enable_ddl_propagation is on; trigger.c:719-723 errors the
  DEPENDS ON EXTENSION form with its own message. With propagation
  OFF, or on plain/local tables, the statement is accepted
  (regress: citus_table_triggers.sql + its .out). This engine
  mirrors that gate exactly, and records accepted triggers as
  visible no-ops: trigger BODIES do not fire here — writes go
  through the distributed write funnel, not per-row procedures.
- Collations: commands/collation.c propagates CREATE COLLATION
  (regress: distributed_collations.sql). Here CREATE COLLATION
  registers the name; COLLATE clauses in expressions are accepted
  for REGISTERED or built-in collations and stripped — sorts run in
  binary (UTF-8 code point) order, a DOCUMENTED divergence from
  locale order (the oracle cannot check locale sorts either). An
  unregistered collation name errors like PG.
- Row-level security: multi_alter_table_row_level_security.sql.
  Deliberately out of scope — an analytical engine with no per-user
  session model cannot enforce per-user read predicates, and
  accepting the DDL silently would claim a security property the
  engine does not have. Every policy/RLS statement raises one NAMED
  error instead of a parse failure.
"""

from __future__ import annotations

import re

_IDENT = r'(?:"[^"]+"|[A-Za-z_][\w$]*)'
_QNAME = rf"{_IDENT}(?:\s*\.\s*{_IDENT})*"


def _unquote(name: str) -> str:
    name = name.strip()
    parts = [
        p.strip()[1:-1] if p.strip().startswith('"') else p.strip().lower()
        for p in re.split(r"\.", name)
    ]
    return ".".join(parts)


# --- triggers ---------------------------------------------------------

_CREATE_TRIGGER = re.compile(
    rf"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?(?:CONSTRAINT\s+)?TRIGGER\s+"
    rf"(?P<name>{_IDENT})\s+"
    rf"(?P<timing>BEFORE|AFTER|INSTEAD\s+OF)\s+"
    rf"(?P<events>(?:INSERT|UPDATE(?:\s+OF\s+[\w\s,\"]+?)?|DELETE"
    rf"|TRUNCATE)(?:\s+OR\s+(?:INSERT|UPDATE(?:\s+OF\s+[\w\s,\"]+?)?"
    rf"|DELETE|TRUNCATE))*)\s+"
    rf"ON\s+(?P<table>{_QNAME})\b(?P<rest>.*)$",
    re.I | re.S,
)
_DROP_TRIGGER = re.compile(
    rf"^\s*DROP\s+TRIGGER\s+(?P<ine>IF\s+EXISTS\s+)?(?P<name>{_IDENT})\s+"
    rf"ON\s+(?P<table>{_QNAME})\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_ALTER_TRIGGER = re.compile(
    rf"^\s*ALTER\s+TRIGGER\s+(?P<name>{_IDENT})\s+ON\s+"
    rf"(?P<table>{_QNAME})\s+(?P<action>RENAME\s+TO\s+(?P<newname>{_IDENT})"
    rf"|(?P<nodep>NO\s+)?DEPENDS\s+ON\s+EXTENSION\s+{_IDENT})\s*;?\s*$",
    re.I,
)
_TABLE_TRIGGER_TOGGLE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:ONLY\s+)?"
    rf"(?P<table>{_QNAME})\s+(?P<verb>ENABLE|DISABLE)\s+"
    rf"(?:ALWAYS\s+|REPLICA\s+)?TRIGGER\s+"
    rf"(?P<name>ALL|USER|{_IDENT})\s*;?\s*$",
    re.I,
)


def parse_trigger(sql: str):
    """→ (kind, trigger_name, table, extra) for any trigger command,
    else None. kind ∈ {create, drop, rename, depends, toggle}; names
    are unquoted/case-folded. For create, extra is the PG14+
    OR REPLACE flag (an existing (table, name) record is overwritten
    instead of raising 'already exists'); for rename it is the new
    name; for depends it is True."""
    m = _CREATE_TRIGGER.match(sql)
    if m:
        return ("create", _unquote(m.group("name")),
                _unquote(m.group("table")), bool(m.group("replace")))
    m = _DROP_TRIGGER.match(sql)
    if m:
        return (
            "drop" if not m.group("ine") else "drop_if_exists",
            _unquote(m.group("name")), _unquote(m.group("table")), False,
        )
    m = _ALTER_TRIGGER.match(sql)
    if m:
        if m.group("newname"):
            return ("rename", _unquote(m.group("name")),
                    _unquote(m.group("table")),
                    _unquote(m.group("newname")))
        return ("depends", _unquote(m.group("name")),
                _unquote(m.group("table")), True)
    m = _TABLE_TRIGGER_TOGGLE.match(sql)
    if m:
        return ("toggle", _unquote(m.group("name")),
                _unquote(m.group("table")), False)
    return None


_TRIGGER_FUNC = re.compile(
    rf"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(?P<name>{_QNAME})"
    rf"\s*\([^)]*\)\s+RETURNS\s+trigger\b",
    re.I | re.S,
)


def parse_trigger_function(sql: str) -> str | None:
    """→ function name for CREATE FUNCTION .. RETURNS trigger, else
    None. A trigger function's body only ever runs FROM a trigger —
    and triggers are recorded no-ops here — so the body is accepted
    verbatim instead of through the plpgsql executor (which would
    reject NEW/OLD row references it can never be asked to run)."""
    m = _TRIGGER_FUNC.match(sql)
    return _unquote(m.group("name")) if m else None


# --- collations -------------------------------------------------------

_CREATE_COLLATION = re.compile(
    rf"^\s*CREATE\s+COLLATION\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<name>{_QNAME})\s*"
    rf"(?:\(\s*(?P<opts>[^)]*)\)|FROM\s+(?P<src>{_QNAME}))\s*;?\s*$",
    re.I | re.S,
)
_DROP_COLLATION = re.compile(
    rf"^\s*DROP\s+COLLATION\s+(?P<ife>IF\s+EXISTS\s+)?"
    rf"(?P<name>{_QNAME})\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_ALTER_COLLATION = re.compile(
    rf"^\s*ALTER\s+COLLATION\s+(?P<name>{_QNAME})\s+"
    rf"(?:RENAME\s+TO\s+(?P<newname>{_IDENT})"
    rf"|OWNER\s+TO\s+{_IDENT}|SET\s+SCHEMA\s+{_IDENT}"
    rf"|REFRESH\s+VERSION)\s*;?\s*$",
    re.I,
)

# collations PG ships with (always valid in a COLLATE clause)
BUILTIN_COLLATIONS = frozenset(
    {"c", "posix", "default", "ucs_basic", "unicode", "c.utf-8",
     "pg_c_utf8"}
)


def parse_collation(sql: str):
    """→ (kind, name, payload) for collation DDL, else None."""
    m = _CREATE_COLLATION.match(sql)
    if m:
        opts = m.group("opts")
        payload = {"options": opts.strip()} if opts is not None else {
            "from": _unquote(m.group("src"))
        }
        payload["if_not_exists"] = bool(m.group("ine"))
        return ("create", _unquote(m.group("name")), payload)
    m = _DROP_COLLATION.match(sql)
    if m:
        return ("drop", _unquote(m.group("name")),
                {"if_exists": bool(m.group("ife"))})
    m = _ALTER_COLLATION.match(sql)
    if m:
        new = m.group("newname")
        return ("alter", _unquote(m.group("name")),
                {"rename_to": _unquote(new) if new else None})
    return None


_COLLATE_CLAUSE = re.compile(rf"\s+COLLATE\s+(?P<name>{_QNAME})", re.I)


def strip_collate(sql: str, registered: dict) -> str:
    """Remove COLLATE clauses from an expression/DDL statement,
    validating each name against the registered + built-in set (an
    unknown collation errors, like PG). The resulting comparison/sort
    runs in binary (UTF-8 code point) order — documented divergence
    from locale collations; see module docstring."""
    from citus_spark.plans.rewrites import _masked_spans

    spans = _masked_spans(sql)
    out, pos = [], 0
    for m in _COLLATE_CLAUSE.finditer(sql):
        if any(a <= m.start() < b for a, b in spans):
            continue
        raw = m.group("name")
        name = _unquote(raw)
        short = name.split(".")[-1]
        quoted = raw.strip().split(".")[-1].strip().startswith('"')
        # locale-style names ("en_US", "de-u-co-phonebk") that PG
        # resolves via libc/icu: accepted with a REQUIRED region/
        # extension part, so a bare typo'd identifier still errors
        # like PG ('collation "foo" does not exist'). Quoted names
        # admit the full ICU shape; bare ones only lc_CC.
        locale_shape = (
            r"[a-z]{2,3}[_-][\w.\-@]+" if quoted
            else r"[a-z]{2,3}_\w+"
        )
        if (
            name not in registered
            and short not in registered
            and short.lower() not in BUILTIN_COLLATIONS
            and not re.fullmatch(locale_shape, short, re.I)
        ):
            raise ValueError(f'collation "{short}" does not exist')
        out.append(sql[pos:m.start()])
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)


# --- row-level security ----------------------------------------------

_RLS = re.compile(
    rf"^\s*(?:(?:CREATE|ALTER|DROP)\s+POLICY\b"
    rf"|ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:ONLY\s+)?{_QNAME}\s+"
    rf"(?:ENABLE|DISABLE|FORCE|NO\s+FORCE)\s+ROW\s+LEVEL\s+SECURITY)",
    re.I,
)


def is_rls_statement(sql: str) -> bool:
    return bool(_RLS.match(sql))


RLS_ERROR = (
    "row-level security is not supported by this engine: policies "
    "attach per-user read predicates, and this analytical engine has "
    "no per-user session model to enforce them (accepting the DDL "
    "silently would claim a security property the engine does not "
    "have). Apply the predicate explicitly in queries or views. "
    "Reference surface: multi_alter_table_row_level_security.sql."
)
