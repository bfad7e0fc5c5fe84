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
