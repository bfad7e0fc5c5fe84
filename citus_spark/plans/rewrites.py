"""Opt-in SQL rewrites — the engine's counterpart of the reference's
planner GUCs.

- ``rewrite_count_distinct``: COUNT(DISTINCT x) → approx_count_distinct
  (x, rsd). ↔ citus.count_distinct_error_rate
  (multi_logical_optimizer.c:1711-1760: worker hll_add_agg +
  coordinator hll_union_agg). Spark's approx_count_distinct is the
  same HLL++ split executed by partial/final aggregation.
- ``pg_casts``: PostgreSQL `expr::type` → CAST(expr AS type), the most
  common PG-ism in ported queries. (Deeper PG semantic differences —
  integer division, collation order — are documented in README §SQL
  semantics rather than rewritten textually.)

These are token-aware textual rewrites applied before parsing,
mirroring how the reference rewrites at the Query-tree level. They
are opt-in (off by default): the SQL is first split into
code / string-literal / comment segments and the patterns apply only
to code, so a literal like ``WHERE c = 'x::int'`` or a commented-out
``COUNT(DISTINCT …)`` is never touched. A cast applied TO a literal
(``'1'::int``) is still rewritten — the ``::`` there is code.
"""

from __future__ import annotations

import re

# '...literal...' (with '' escapes), -- line comments, /* block */
_SEGMENT = re.compile(r"('(?:[^']|'')*')|(--[^\n]*)|(/\*.*?\*/)", re.DOTALL)

# COUNT(DISTINCT col) with a simple column or qualified name inside
_COUNT_DISTINCT = re.compile(
    r"\bCOUNT\s*\(\s*DISTINCT\s+([A-Za-z_][\w.]*)\s*\)", re.IGNORECASE
)

_TYPE = r"[A-Za-z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?"
# expr::type where expr is a simple identifier or number (literal
# operands are handled at segment boundaries below)
_PG_CAST = re.compile(rf"([A-Za-z_][\w.]*|\d+(?:\.\d+)?)::({_TYPE})")
# a code segment that *starts* with ::type — its operand was the
# string literal in the immediately preceding segment
_LEADING_CAST = re.compile(rf"^::({_TYPE})")


def _segments(sql: str) -> list[tuple[str, str]]:
    """Split into [('code'|'literal'|'comment', text), ...]."""
    out: list[tuple[str, str]] = []
    pos = 0
    for m in _SEGMENT.finditer(sql):
        out.append(("code", sql[pos : m.start()]))
        kind = "literal" if m.group(1) is not None else "comment"
        out.append((kind, m.group(0)))
        pos = m.end()
    out.append(("code", sql[pos:]))
    return out


def _map_code(sql: str, fn) -> str:
    return "".join(fn(t) if k == "code" else t for k, t in _segments(sql))


def rewrite_count_distinct(sql: str, rsd: float = 0.023) -> str:
    """Rewrite exact COUNT(DISTINCT col) to approx_count_distinct.

    rsd default 2.3% ≈ HLL with 2^11 registers, close to the
    reference's citus.count_distinct_error_rate typical setting.
    """
    return _map_code(
        sql, lambda s: _COUNT_DISTINCT.sub(rf"approx_count_distinct(\1, {rsd})", s)
    )


def extract_materialized_ctes(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Split `WITH name AS MATERIALIZED (body)` CTEs out of a query.

    ↔ reference cte_inline.c: PostgreSQL's MATERIALIZED keyword forces
    the CTE to evaluate once into an intermediate result instead of
    inlining (Citus then treats it like a reference-table scan —
    read_intermediate_result). Spark's parser rejects the keyword, so
    the session extracts these CTEs textually, evaluates each once
    into a cached relation, and runs the remaining query against it.

    Returns ([(name, body), ...] in declaration order, remaining_sql).
    Plain (non-MATERIALIZED) CTEs are left for Catalyst to inline.
    String literals/comments are never scanned for the keyword.
    """
    head = re.compile(
        r"([A-Za-z_]\w*)\s+AS\s+MATERIALIZED\s*\(", re.IGNORECASE
    )
    found: list[tuple[str, str]] = []
    while True:
        # positions of literals/comments to skip
        masked: list[tuple[int, int]] = [
            (m.start(), m.end()) for m in _SEGMENT.finditer(sql)
        ]

        def in_code(pos: int) -> bool:
            return not any(a <= pos < b for a, b in masked)

        m = next((m for m in head.finditer(sql) if in_code(m.start())), None)
        if m is None:
            break
        # balanced-paren scan from the opening '(' (skip literal spans)
        depth, i = 0, m.end() - 1
        while i < len(sql):
            if not in_code(i):
                i += 1
                continue
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            raise ValueError("unbalanced parentheses in MATERIALIZED CTE")
        found.append((m.group(1), sql[m.end() : i].strip()))
        before, after = sql[: m.start()], sql[i + 1 :]
        # drop one list comma: the following one, else the preceding one
        m_after = re.match(r"\s*,", after)
        if m_after:
            after = after[m_after.end() :]
        else:
            before = re.sub(r",\s*$", " ", before)
        sql = before + after
        # no CTEs left in the WITH list → drop the WITH keyword
        sql = re.sub(
            r"\bWITH\s+(?=SELECT\b|\()", "", sql, count=1, flags=re.IGNORECASE
        )
    return found, sql


def pg_casts(sql: str) -> str:
    """Rewrite PostgreSQL ``expr::type`` casts to ANSI CAST."""
    segs = _segments(sql)
    out: list[str] = []
    prev_kind = None
    for kind, text in segs:
        if kind == "code":
            # literal operand: previous segment was '...'  and this
            # code segment begins with ::type
            m = _LEADING_CAST.match(text) if prev_kind == "literal" else None
            if m:
                lit = out.pop()
                out.append(f"CAST({lit} AS {m.group(1)})")
                text = text[m.end() :]
            text = _PG_CAST.sub(r"CAST(\1 AS \2)", text)
        out.append(text)
        prev_kind = kind
    return "".join(out)
