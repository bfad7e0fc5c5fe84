"""Textual UPDATE / DELETE — the row-DML half of the SQL front door.

↔ reference DML planning (planner/multi_router_planner.c routes
single-shard UPDATE/DELETE; modify_planner handles multi-shard): the
reference executes these in place per shard. Parquet has no in-place
row mutation, so the execution is the same copy-on-write rewrite the
MERGE path uses (and the same one Delta/Iceberg perform under their
DML): filter/recompute the relation, write to a temp directory, swap.
At 100 TB with a time/tenant-partitioned layout the rewrite touches
only the partitions the predicate selects (dynamic partition
overwrite); here it is a whole-relation rewrite, documented as such.

Grammar (the analytical subset):

    DELETE FROM <table> [WHERE <pred>]
    UPDATE <table> SET col = expr [, col = expr ...] [WHERE <pred>]

SQL semantics preserved: all SET expressions are evaluated against
the OLD row (simultaneous assignment), and rows whose predicate is
NULL are not affected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s*;?\s*$",
    re.I | re.S,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<t>[A-Za-z_][\w.]*)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s*;?\s*$",
    re.I | re.S,
)


@dataclass
class DmlStatement:
    kind: str  # "update" | "delete"
    table: str
    predicate: str | None
    assignments: list[tuple[str, str]]  # UPDATE only


def is_dml(sql: str) -> bool:
    return bool(_DELETE.match(sql) or _UPDATE.match(sql))


def _split_assignments(sets: str) -> list[tuple[str, str]]:
    """Split `a = e1, b = e2` on top-level commas (paren- and
    quote-aware, so f(x, y) and 'a,b' literals survive)."""
    parts: list[str] = []
    depth = 0
    quote = None
    cur = []
    for ch in sets:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = []
    for p in parts:
        if "=" not in p:
            raise ValueError(f"UPDATE: cannot parse assignment {p!r}")
        col, expr = p.split("=", 1)
        col = col.strip()
        if not re.match(r"^[A-Za-z_]\w*$", col):
            raise ValueError(f"UPDATE: invalid column name {col!r}")
        out.append((col, expr.strip()))
    return out


def parse_dml(sql: str) -> DmlStatement | None:
    m = _UPDATE.match(sql)
    if m:
        return DmlStatement(
            kind="update",
            table=m.group("t"),
            predicate=m.group("pred"),
            assignments=_split_assignments(m.group("sets")),
        )
    m = _DELETE.match(sql)
    if m:
        return DmlStatement(
            kind="delete",
            table=m.group("t"),
            predicate=m.group("pred"),
            assignments=[],
        )
    return None
