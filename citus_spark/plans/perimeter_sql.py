"""Foreign-data-wrapper, SECURITY LABEL, RULE, and LISTEN/NOTIFY
perimeter — the last statement classes a PG 16 pg_dump or psql
session can emit that used to die with a raw Spark ParseException
(r10 verdict items #4/#7). The engine's perimeter policy: every
statement class the reference has a position on gets either a
recorded no-op or ONE named error explaining the scope decision —
never a syntax error from a parser that doesn't speak PG.

↔ reference behavior:

- FDW surface: commands/foreign_data_wrapper.c propagates
  GRANT/REVOKE on FDWs; commands/foreign_server.c propagates
  CREATE/ALTER/DROP SERVER; foreign tables can become Citus local
  tables (regress: multi_create_fdw.sql, foreign_tables_mx.sql,
  propagate_foreign_servers.sql). This engine's sources are parquet/
  csv/jsonl fixtures — there is no live remote-PG connection surface
  to wrap, so every FDW statement raises one named error instead of
  a parse failure (BASELINE.json scopes FDWs out of the analytical
  surface).
- SECURITY LABEL: commands/seclabel.c propagates labels to workers
  (regress: seclabel.sql). Labels exist for providers like sepgsql/
  anon that enforce them at read time; with no provider hook in this
  engine, accepting the DDL silently would claim a security property
  it does not have — same policy as row-level security: one named
  error.
- CREATE RULE: the PG rewrite system turns statements into other
  statements at parse time. Recording a rule as a no-op would
  silently change write semantics (an ON INSERT DO INSTEAD rule that
  never fires), so rule DDL raises one named error. pg_dump does not
  emit user rules for ordinary tables (views travel as CREATE VIEW).
- LISTEN / UNLISTEN / NOTIFY: async notification channels have no
  effect on query results, and an analytical session has no
  listeners — accepted as recorded no-ops so interactive psql
  scripts replay (PG itself treats them as zero-cost session
  statements).
"""

from __future__ import annotations

import re

_IDENT = r'(?:"[^"]+"|[A-Za-z_][\w$]*)'
_QNAME = rf"{_IDENT}(?:\s*\.\s*{_IDENT})*"

# --- foreign-data wrappers -------------------------------------------

_FDW = re.compile(
    rf"^\s*(?:"
    rf"(?:CREATE|ALTER|DROP)\s+SERVER\b"
    rf"|(?:CREATE|ALTER|DROP)\s+FOREIGN\s+DATA\s+WRAPPER\b"
    rf"|(?:CREATE|ALTER|DROP)\s+FOREIGN\s+TABLE\b"
    rf"|IMPORT\s+FOREIGN\s+SCHEMA\b"
    rf"|(?:CREATE|ALTER|DROP)\s+USER\s+MAPPING\b"
    rf")",
    re.I,
)

FDW_ERROR = (
    "foreign-data wrappers are not supported by this engine: its "
    "sources are parquet/csv/jsonl paths read directly by Spark, and "
    "there is no live remote-server connection surface to wrap "
    "(reference surface: commands/foreign_data_wrapper.c, "
    "commands/foreign_server.c; regress multi_create_fdw.sql). "
    "Register the external data as a path-backed table "
    "(create_distributed_table / load_views) instead."
)


def is_fdw_statement(sql: str) -> bool:
    return bool(_FDW.match(sql))


# --- security labels --------------------------------------------------

_SECLABEL = re.compile(r"^\s*SECURITY\s+LABEL\b", re.I)

SECLABEL_ERROR = (
    "SECURITY LABEL is not supported by this engine: labels are "
    "enforced by an external provider (sepgsql, anon) at read time, "
    "and this engine has no provider hook — accepting the DDL "
    "silently would claim a security property it does not have "
    "(same policy as row-level security). Reference surface: "
    "commands/seclabel.c; regress seclabel.sql."
)


def is_seclabel_statement(sql: str) -> bool:
    return bool(_SECLABEL.match(sql))


# --- rules ------------------------------------------------------------

_RULE = re.compile(
    rf"^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?RULE\s+{_IDENT}\s+AS\b"
    rf"|DROP\s+RULE\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s+ON\s+{_QNAME})",
    re.I | re.S,
)

RULE_ERROR = (
    "query rewrite rules are not supported by this engine: a rule "
    "rewrites statements into other statements at parse time, and "
    "recording one as a no-op would silently change DML semantics "
    "(e.g. an ON INSERT DO INSTEAD rule that never fires). Express "
    "the rewrite as a view, trigger-free MERGE, or explicit query "
    "instead."
)


def is_rule_statement(sql: str) -> bool:
    return bool(_RULE.match(sql))


# --- async notification ----------------------------------------------

_LISTEN = re.compile(
    rf"^\s*(?:"
    rf"LISTEN\s+{_IDENT}"
    rf"|UNLISTEN\s+(?:\*|{_IDENT})"
    rf"|NOTIFY\s+{_IDENT}(?:\s*,\s*'(?:[^']|'')*')?"
    rf")\s*;?\s*$",
    re.I,
)


def parse_listen_notify(sql: str) -> str | None:
    """→ the statement verb (LISTEN/UNLISTEN/NOTIFY) for an async
    notification statement, else None. These are accepted as recorded
    no-ops: channels have no effect on query results and the session
    has no listeners."""
    m = _LISTEN.match(sql)
    if not m:
        return None
    return sql.strip().split(None, 1)[0].upper()


# --- admin statements with no query-visible effect here ---------------
# pg_dump / psql admin-session surface accepted as RECORDED NO-OPS.
# The test is always "can this statement change a query result in
# THIS engine?" — privileges/ownership are already no-ops (GRANT/
# REVOKE/OWNER TO), trigger bodies never fire (same policy extends to
# event triggers), extended statistics only hint a planner Catalyst
# replaces, publications have no replication consumer, ALTER SYSTEM
# writes a server config file that does not exist here, CHECKPOINT is
# pure maintenance, and text-search config NAMES are already accepted
# -and-ignored at every ts call site (plans/textsearch_sql.py strips
# the config argument — simple-config semantics, documented
# divergence).
_ADMIN_NOOP = re.compile(
    rf"^\s*(?:"
    rf"ALTER\s+DEFAULT\s+PRIVILEGES\b"
    # (role lifecycle lives with its CREATE/ALTER siblings in
    # ddl_sql._NOOP — one home for the whole role surface)
    rf"|(?:CREATE|ALTER|DROP)\s+STATISTICS\b"
    rf"|(?:CREATE|ALTER|DROP)\s+PUBLICATION\b"
    rf"|(?:CREATE|ALTER|DROP)\s+EVENT\s+TRIGGER\b"
    rf"|REASSIGN\s+OWNED\s+BY\b"
    rf"|DROP\s+OWNED\s+BY\b"
    rf"|ALTER\s+SYSTEM\s+(?:SET|RESET)\b"
    rf"|CHECKPOINT\b"
    rf"|LOAD\s+'[^']*'"
    rf"|(?:CREATE|ALTER|DROP)\s+TEXT\s+SEARCH\s+"
    rf"(?:CONFIGURATION|DICTIONARY|PARSER|TEMPLATE)\b"
    rf")",
    re.I,
)


def parse_admin_noop(sql: str) -> str | None:
    """→ a short description when the statement is an accepted admin
    no-op, else None. The description is the matched KEYWORD HEAD
    (e.g. 'DROP ROLE', 'ALTER SYSTEM SET'), never operand text — a
    fixed word-count slice produced garbled status lines like
    "DROP ROLE IF" and uppercased quoted file names (review fix)."""
    m = _ADMIN_NOOP.match(sql)
    if not m:
        return None
    head = m.group(0).split("'")[0].strip()
    return " ".join(head.split()).upper()


# --- object classes that would silently change query semantics --------
# Accepting these as no-ops would LIE about capability: a custom cast/
# operator/transform changes how later expressions evaluate, a
# subscription claims live replication, an access method claims a
# storage engine. One named error each.
_UNSUPPORTED_OBJECTS = [
    (
        re.compile(r"^\s*(?:CREATE|ALTER|DROP)\s+SUBSCRIPTION\b", re.I),
        "logical-replication subscriptions are not supported: a "
        "subscription actively pulls remote changes, and this engine "
        "has no replication worker. Use the CDC apply operator "
        "(streaming/cdc_apply.py) over a change feed instead.",
    ),
    (
        re.compile(r"^\s*(?:CREATE|DROP)\s+ACCESS\s+METHOD\b", re.I),
        "custom access methods are not supported: storage is parquet "
        "(with the columnar-options layer of sources/columnar.py); a "
        "C handler cannot run here. Reference surface: "
        "commands/create_custom_am.c analog.",
    ),
    (
        re.compile(r"^\s*(?:CREATE|DROP)\s+CAST\b", re.I),
        "custom casts are not supported: a user-defined cast changes "
        "how later expressions evaluate, and recording it as a no-op "
        "would silently alter query semantics. Cast explicitly in "
        "queries instead.",
    ),
    (
        re.compile(
            r"^\s*(?:CREATE|ALTER|DROP)\s+OPERATOR\b(?!\s+(?:CLASS|FAMILY))",
            re.I,
        ),
        "user-defined operators are not supported: queries using a "
        "custom operator symbol cannot parse here, so accepting the "
        "DDL would only defer the failure. Define a SQL function "
        "(CREATE FUNCTION ... RETURN expr) and call it instead.",
    ),
    (
        re.compile(
            r"^\s*(?:CREATE|ALTER|DROP)\s+OPERATOR\s+(?:CLASS|FAMILY)\b",
            re.I,
        ),
        "operator classes/families configure index access methods, "
        "which this engine does not have (scans are parquet + "
        "Catalyst pruning). Not supported.",
    ),
    (
        re.compile(r"^\s*(?:CREATE|DROP)\s+TRANSFORM\b", re.I),
        "CREATE TRANSFORM maps PG types into procedural-language "
        "types; no such language runtime exists here. Not supported.",
    ),
]


def unsupported_object_error(sql: str) -> str | None:
    """→ the named error message when the statement creates an object
    class this engine must refuse, else None."""
    for rx, msg in _UNSUPPORTED_OBJECTS:
        if rx.match(sql):
            return msg
    return None


# single source of truth for the session's statement-head gate: a
# statement matching this MUST be classified by parse_admin_noop or
# unsupported_object_error (the session references this regex instead
# of hand-maintaining a duplicate list that can drift — review fix)
ADMIN_HEAD = re.compile(
    r"^\s*(?:ALTER\s+DEFAULT\s+PRIVILEGES"
    r"|(?:CREATE|ALTER|DROP)\s+(?:STATISTICS|PUBLICATION|SUBSCRIPTION"
    r"|TEXT\s+SEARCH|ACCESS\s+METHOD|EVENT\s+TRIGGER"
    r"|OPERATOR\b|CAST\b|TRANSFORM\b)"
    r"|REASSIGN\s+OWNED|DROP\s+OWNED|ALTER\s+SYSTEM"
    r"|CHECKPOINT\b|LOAD\s+')",
    re.I,
)
