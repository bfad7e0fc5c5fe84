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

    DELETE FROM <table> [WHERE <pred>] [RETURNING exprs]
    UPDATE <table> SET col = expr [, col = expr ...] [WHERE <pred>]
        [RETURNING exprs]

SQL semantics preserved: all SET expressions are evaluated against
the OLD row (simultaneous assignment), and rows whose predicate is
NULL are not affected. RETURNING follows PostgreSQL: DELETE returns
the old image of each removed row, UPDATE the new image of each
updated row (↔ reference multi_router_planner.c, which ships the
RETURNING projection back from each shard — here the projection is
staged before the copy-on-write swap so it reads pre-swap state).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_DELETE_HEAD = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<a>(?!USING\b|WHERE\b)[A-Za-z_]\w*))?"
    r"(?P<rest>(?:\s+.*)?)\s*;?\s*$",
    re.I | re.S,
)
_UPDATE_HEAD = re.compile(
    r"^\s*UPDATE\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<a>(?!SET\b)[A-Za-z_]\w*))?"
    r"\s+SET\s+(?P<rest>.+?)\s*;?\s*$",
    re.I | re.S,
)


def _find_top_kw(text: str, kw: str) -> int | None:
    """Index of the first depth-0, unquoted occurrence of keyword
    `kw` — a FROM/WHERE inside a subquery or string literal never
    splits the statement."""
    depth = 0
    quote = None
    n = len(text)
    klen = len(kw)
    for i, ch in enumerate(text):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and text[i : i + klen].upper() == kw:
            before_ok = i == 0 or not (
                text[i - 1].isalnum() or text[i - 1] == "_"
            )
            after = text[i + klen : i + klen + 1]
            after_ok = after == "" or not (after.isalnum() or after == "_")
            if before_ok and after_ok:
                return i
    return None


@dataclass
class DmlStatement:
    kind: str  # "update" | "delete"
    table: str
    predicate: str | None
    assignments: list[tuple[str, str]]  # UPDATE only
    returning: str | None = None
    # UPDATE .. FROM / DELETE .. USING (PG join-DML): the extra
    # relations, verbatim, plus the target's effective alias
    from_clause: str | None = None
    alias: str | None = None


def split_returning(sql: str) -> tuple[str, str | None]:
    """Strip a trailing top-level `RETURNING <exprs>` clause.

    Returns (body, returning_list|None). The scan is paren- and
    quote-aware so `'a RETURNING b'` literals and subquery text never
    match; only the LAST depth-0 occurrence is the clause (PG's
    grammar puts RETURNING at the very end of the statement).
    """
    depth = 0
    quote = None
    pos = None
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "Rr":
            m = re.match(r"RETURNING\s", sql[i:], re.I)
            # keyword boundary: previous char must not be part of an
            # identifier (e.g. `col_returning` is not the clause)
            if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                pos = i
                i += m.end()
                continue
        i += 1
    if pos is None:
        return sql, None
    body = sql[:pos].rstrip()
    ret = sql[pos:].strip().rstrip(";").strip()
    ret = re.sub(r"^RETURNING\s+", "", ret, flags=re.I)
    if not ret:
        raise ValueError("RETURNING: empty expression list")
    return body, ret


def is_dml(sql: str) -> bool:
    body, _ = split_returning(sql)
    return bool(_DELETE_HEAD.match(body) or _UPDATE_HEAD.match(body))


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
    body, returning = split_returning(sql)
    m = _UPDATE_HEAD.match(body)
    if m:
        # split SET-list / FROM / WHERE on depth-0 keywords — a
        # scalar subquery in a SET expression keeps its own FROM and
        # WHERE behind parens, so they never match here
        rest = m.group("rest")
        fpos = _find_top_kw(rest, "FROM")
        wpos = _find_top_kw(rest, "WHERE")
        from_clause = pred = None
        if fpos is not None and (wpos is None or fpos < wpos):
            sets = rest[:fpos]
            tail = rest[fpos + 4 :]
            twpos = _find_top_kw(tail, "WHERE")
            if twpos is not None:
                from_clause = tail[:twpos].strip()
                pred = tail[twpos + 5 :].strip()
            else:
                from_clause = tail.strip()
        elif wpos is not None:
            sets = rest[:wpos]
            pred = rest[wpos + 5 :].strip()
        else:
            sets = rest
        return DmlStatement(
            kind="update",
            table=m.group("t"),
            predicate=pred,
            assignments=_split_assignments(sets),
            returning=returning,
            from_clause=from_clause,
            alias=m.group("a"),
        )
    m = _DELETE_HEAD.match(body)
    if m:
        rest = m.group("rest") or ""
        upos = _find_top_kw(rest, "USING")
        wpos = _find_top_kw(rest, "WHERE")
        using = pred = None
        if upos is not None and (wpos is None or upos < wpos):
            tail = rest[upos + 5 :]
            twpos = _find_top_kw(tail, "WHERE")
            if twpos is not None:
                using = tail[:twpos].strip()
                pred = tail[twpos + 5 :].strip()
            else:
                using = tail.strip()
        elif wpos is not None:
            pred = rest[wpos + 5 :].strip()
        elif rest.strip():
            raise ValueError(
                f"DELETE: cannot parse trailing clause {rest.strip()[:40]!r}"
            )
        return DmlStatement(
            kind="delete",
            table=m.group("t"),
            predicate=pred,
            assignments=[],
            returning=returning,
            from_clause=using,
            alias=m.group("a"),
        )
    return None
