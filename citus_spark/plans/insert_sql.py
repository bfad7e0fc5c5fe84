"""Textual INSERT — including the reference's real-time rollup idiom.

↔ reference INSERT handling: multi-row INSERT routes rows to shards
(RouterInsertTaskList, multi_router_planner.c:1789), INSERT..SELECT
picks co-located/repartition strategies (insert_select_planner.c),
and the documented real-time-analytics idiom is repeated
`INSERT INTO rollup SELECT ... ON CONFLICT (keys) DO UPDATE`
(distributed/README.md:1755-1767). Here:

    INSERT INTO <table> [(cols)] VALUES (row), (row), ...
    INSERT INTO <table> [(cols)] SELECT ...
    ... [ON CONFLICT (keys) DO NOTHING
         | ON CONFLICT (keys) DO UPDATE SET c = expr, ...]

Plain INSERT appends through the live storage (period-routed for
time-partitioned targets). ON CONFLICT maps onto the merge executor:
DO NOTHING = when_matched ignore, DO UPDATE = assignment-form merge;
`EXCLUDED.` references normalize to the source side (`s.`), the
target table's name to `t.` — PostgreSQL's aliasing exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class InsertStatement:
    table: str
    cols: list[str]  # empty = positional full-row
    source_sql: str  # a SELECT/VALUES query string (Spark-executable)
    on_conflict: str | None  # None | "nothing" | "update"
    conflict_keys: list[str] = field(default_factory=list)
    assignments: list[tuple[str, str]] = field(default_factory=list)
    returning: str | None = None
    # DO UPDATE .. WHERE guard (t./s. normalized); guard-failed
    # conflicting rows keep their OLD image (PG)
    conflict_where: str | None = None


_HEAD = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[A-Za-z_][\w.]*)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?",
    re.I,
)
_CONFLICT = re.compile(
    r"\bON\s+CONFLICT\s*\((?P<keys>[^)]*)\)\s*DO\s+"
    r"(?P<action>NOTHING|UPDATE\s+SET\s+.+?)\s*;?\s*$",
    re.I | re.S,
)


def is_insert(sql: str) -> bool:
    return bool(_HEAD.match(sql))


# SQL keywords/literals a bare identifier in a conflict guard can be —
# everything else must be a TARGET column (PG scoping: only the target
# row and EXCLUDED are visible in DO UPDATE .. WHERE), so it qualifies
# as t.<name>; the merge executor's joined frame carries both sides
# and an unqualified shared column would otherwise be ambiguous.
_GUARD_KEYWORDS = frozenset({
    "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IS", "IN", "BETWEEN",
    "LIKE", "ILIKE", "SIMILAR", "TO", "CASE", "WHEN", "THEN", "ELSE",
    "END", "EXISTS", "SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER",
    "LIMIT", "DISTINCT", "AS", "ON", "JOIN", "INTERVAL", "CAST", "ANY",
    "ALL", "SOME", "ESCAPE", "T", "S",
    # niladic SQL functions / paren-less keywords — valid in a guard
    # without being target columns (PG parses them as value
    # expressions, not identifiers)
    "CURRENT_TIMESTAMP", "CURRENT_DATE", "CURRENT_TIME", "LOCALTIME",
    "LOCALTIMESTAMP", "CURRENT_USER", "SESSION_USER", "CURRENT_ROLE",
    "CURRENT_CATALOG", "CURRENT_SCHEMA", "USER", "DEFAULT",
})


def _qualify_guard(text: str) -> str:
    """Qualify bare identifiers in a DO UPDATE guard with t. — PG
    resolves them to the existing target row."""
    from citus_spark.plans.rewrites import _masked_spans

    spans = _masked_spans(text)

    def repl(m: re.Match) -> str:
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)
        word = m.group(0)
        if word.upper() in _GUARD_KEYWORDS:
            return word
        return f"t.{word}"

    # an identifier not preceded by a dot and not followed by '(' or
    # '.' (function calls and already-qualified refs stay)
    return re.sub(
        r"(?<![\w.$])([A-Za-z_]\w*)(?!\s*[(.])", repl, text
    )


def parse_insert(sql: str) -> InsertStatement | None:
    head = _HEAD.match(sql)
    if not head:
        return None
    from citus_spark.plans.dml_sql import split_returning

    rest, returning = split_returning(sql[head.end() :])
    rest = rest.strip().rstrip(";")
    cols = [
        c.strip()
        for c in (head.group("cols") or "").split(",")
        if c.strip()
    ]
    on_conflict = None
    conflict_keys: list[str] = []
    assignments: list[tuple[str, str]] = []
    conflict_where = None
    cm = _CONFLICT.search(rest)
    if cm:
        rest = rest[: cm.start()].strip()
        conflict_keys = [
            k.strip() for k in cm.group("keys").split(",") if k.strip()
        ]
        action = cm.group("action").strip()
        if action.upper() == "NOTHING":
            on_conflict = "nothing"
        else:
            on_conflict = "update"
            from citus_spark.plans.merge_sql import _split_assignments
            from citus_spark.plans.rewrites import _masked_spans

            # PG grammar puts the conflict guard AFTER the SET list;
            # a depth-0 unmasked WHERE splits it (WHEREs inside
            # assignment subqueries sit behind parens)
            spans = _masked_spans(action)
            depth = 0
            for wm in re.finditer(r"[()]|\bWHERE\b", action, re.I):
                if any(a <= wm.start() < b for a, b in spans):
                    continue
                tok = wm.group(0)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                elif depth == 0:
                    conflict_where = action[wm.end() :].strip()
                    action = action[: wm.start()].rstrip()
                    break
            assignments = _split_assignments(
                re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.I | re.S)
            )
            # PG aliasing: EXCLUDED = the proposed source row; the
            # target table name = the existing row
            def _norm(e: str) -> str:
                return re.sub(
                    rf"\b{re.escape(head.group('table'))}\.",
                    "t.",
                    re.sub(r"\bEXCLUDED\.", "s.", e, flags=re.I),
                    flags=re.I,
                )

            assignments = [(c, _norm(e)) for c, e in assignments]
            if conflict_where is not None:
                conflict_where = _qualify_guard(_norm(conflict_where))
    if re.fullmatch(r"DEFAULT\s+VALUES", rest, re.I):
        # INSERT INTO t DEFAULT VALUES — one all-defaults row. The
        # session substitutes per-column defaults (and identity
        # draws) exactly like an all-DEFAULT VALUES row, which is
        # what PG defines this as.
        if cols:
            raise ValueError(
                "INSERT: DEFAULT VALUES takes no column list"
            )
        rest = "__DEFAULT_VALUES__"
    elif not re.match(r"^(VALUES|SELECT|WITH)\b", rest, re.I):
        # Spark-valid forms we don't model (PARTITION specs, TABLE
        # syntax, ...) — return None so non-catalog targets fall
        # through to Spark's own INSERT handling; the session raises
        # a clear error for CATALOG targets instead
        return None
    return InsertStatement(
        table=head.group("table"),
        cols=cols,
        source_sql=rest,
        on_conflict=on_conflict,
        conflict_keys=conflict_keys,
        assignments=assignments,
        returning=returning,
        conflict_where=conflict_where,
    )
