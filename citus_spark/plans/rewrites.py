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
# dollar-quoted bodies ($$..$$ / $tag$..$tag$) are PG string literals
# (function/procedure bodies, run_command_on_workers arguments) —
# masked like '..' strings so splitters/rewrites never fire inside one
_SEGMENT = re.compile(
    r"('(?:[^']|'')*')|(\$(\w*)\$.*?\$\3\$)|(--[^\n]*)|(/\*.*?\*/)",
    re.DOTALL,
)

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
        # group 1 = '..' string, group 2 = $tag$..$tag$ body — both
        # are LITERALS (dollar quoting is PG string syntax); only the
        # comment groups classify as 'comment' (review fix: literal-
        # adjacency logic must fire for dollar-quoted strings too)
        kind = (
            "literal"
            if m.group(1) is not None or m.group(2) is not None
            else "comment"
        )
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


_RANK_NO_ORDER = re.compile(
    r"\b(rank|dense_rank|percent_rank|cume_dist)\s*\(\s*\)\s*"
    r"OVER\s*\(\s*((?:PARTITION\s+BY\s+[^()]*?)?)\s*\)",
    re.I,
)


def pg_rank_without_order(sql: str) -> str:
    """PG permits ranking functions with no window ORDER BY (every
    row is a peer: rank/dense_rank = 1, percent_rank = 0,
    cume_dist = 1 — window_functions.sql:8-16); Spark requires an
    ordered window. `ORDER BY 1` inside a window spec is the CONSTANT
    1 (ordinals have no meaning there), making all rows peers —
    value-identical to PG. Specs whose PARTITION BY carries nested
    parens are left alone (Spark's own requires-order error is the
    honest outcome there)."""

    def sub(m: re.Match) -> str:
        spec = m.group(2).strip()
        if re.search(r"\bORDER\s+BY\b", spec, re.I):
            return m.group(0)
        inner = (spec + " " if spec else "") + "ORDER BY 1"
        return f"{m.group(1)}() OVER ({inner})"

    return _map_code(sql, lambda c: _RANK_NO_ORDER.sub(sub, c))


def pg_regex_ops(sql: str) -> str:
    """Rewrite PostgreSQL regex/LIKE operators to Spark spellings
    (↔ reference regress scripts use them freely; ILIKE itself needs
    no rewrite — Spark SQL accepts it natively):

      a ~ 'p'    → a RLIKE 'p'          a !~ 'p'   → a NOT RLIKE 'p'
      a ~* 'p'   → a RLIKE '(?i)p'      a !~* 'p'  → a NOT RLIKE '(?i)p'
      a ~~ 'p'   → a LIKE 'p'           a !~~ 'p'  → a NOT LIKE 'p'
      a ~~* 'p'  → a ILIKE 'p'          a !~~* 'p' → a NOT ILIKE 'p'

    Segment-aware and deliberately narrow: the operator must be the
    last code token before a string literal (the overwhelmingly common
    shape), so a bitwise NOT (`~x`) — which never directly precedes a
    string literal after an operand — is left alone. The check that
    the preceding token looks like an operand guards the rest."""
    _OP = re.compile(r"(!?~~?\*?)\s*$")
    _MAP = {
        "~": ("RLIKE", False), "~*": ("RLIKE", True),
        "!~": ("NOT RLIKE", False), "!~*": ("NOT RLIKE", True),
        "~~": ("LIKE", False), "~~*": ("ILIKE", False),
        "!~~": ("NOT LIKE", False), "!~~*": ("NOT ILIKE", False),
    }
    segs = _segments(sql)
    out: list[str] = []
    for i, (kind, text) in enumerate(segs):
        if kind == "code":
            nxt = segs[i + 1] if i + 1 < len(segs) else None
            m = _OP.search(text)
            if m and nxt and nxt[0] == "literal":
                head = text[: m.start()].rstrip()
                # operand guard: previous char must end an expression
                if head and (head[-1].isalnum() or head[-1] in ")_'\""):
                    op, ci = _MAP[m.group(1)]
                    lit = nxt[1]
                    if ci:
                        lit = "'(?i)" + lit[1:]
                    out.append(f"{head} {op} ")
                    out.append(lit)
                    segs[i + 1] = ("code", "")  # literal consumed
                    continue
        out.append(text)
    return "".join(out)


_PG_UNIT_ABBREV = re.compile(
    r"\b(mons?|hrs?|mins?|secs?)\b", re.IGNORECASE
)
_UNIT_MAP = {
    "mon": "months", "mons": "months", "hr": "hours", "hrs": "hours",
    "min": "minutes", "mins": "minutes", "sec": "seconds",
    "secs": "seconds",
}


def pg_intervals(sql: str) -> str:
    """Expand PostgreSQL interval-unit abbreviations Spark rejects:
    INTERVAL '1 mon' → INTERVAL '1 months' (also hr/min/sec forms).
    Only literals directly following the INTERVAL keyword are touched."""
    segs = _segments(sql)
    out: list[str] = []
    prev_code_tail = ""
    for kind, text in segs:
        if (
            kind == "literal"
            and re.search(r"\bINTERVAL\s*$", prev_code_tail, re.IGNORECASE)
            and _PG_UNIT_ABBREV.search(text)
        ):
            text = _PG_UNIT_ABBREV.sub(
                lambda m: _UNIT_MAP[m.group(1).lower()], text
            )
        if kind == "code":
            prev_code_tail = text
        out.append(text)
    return "".join(out)


def pg_json_ops(sql: str, allow_single_arrow: bool = False) -> str:
    """Rewrite PostgreSQL json access operators to get_json_object:

        props ->> 'a'            → get_json_object(props, '$.a')
        props -> 'a' ->> 'b'     → get_json_object(props, '$.a.b')
        props -> 'c' ->> 0       → get_json_object(props, '$.c[0]')

    (↔ the jsonb operator surface Citus workloads lean on; the engine
    models json as string columns, where `->` and `->>` both land on
    get_json_object — Spark dequotes scalar leaves like PG's ->>.)

    A chain is rewritten from its HEAD: `->>` heads always (never
    valid Spark SQL), single-`->` heads only under pg_compat
    (`allow_single_arrow`) — Spark's lambda syntax also spells `x ->
    expr`, and `x -> 'lit'` is syntactically indistinguishable from a
    json access without type information. Inside an accepted chain
    `->` links are unambiguous and always follow. A chain whose head
    was skipped (leading `->`, pg_compat off) is left whole — its
    `->>` tail is NOT rewritten in isolation, which would corrupt the
    expression; it fails loudly in Spark instead."""
    op_head = r"->>?" if allow_single_arrow else r"->>"
    head_pat = re.compile(
        rf"([A-Za-z_][\w.]*)\s*({op_head})\s*$"
    )
    segs = _segments(sql)
    out: list[str] = []
    i = 0
    while i < len(segs):
        kind, text = segs[i]
        if kind != "code":
            out.append(text)
            i += 1
            continue
        m = head_pat.search(text)
        lit_operand = None
        if not (m and i + 1 < len(segs) and segs[i + 1][0] == "literal"):
            # operand may itself be a string literal: previous segment
            # is a literal and this code segment is just the arrow
            # (e.g. '{"a":1}' ->> 'a')
            lm = re.match(rf"\s*({op_head})\s*$", text)
            # the candidate operand literal must not itself be the KEY
            # of an unrewritten arrow to its left (possible when a
            # leading single `->` was skipped without pg_compat):
            # rewriting the tail of a half-chain would corrupt it
            prev_code_ok = (
                i < 2
                or segs[i - 2][0] != "code"
                or not re.search(r"->>?\s*$", segs[i - 2][1])
            )
            if (
                lm
                and out
                and i >= 1
                and segs[i - 1][0] == "literal"
                and i + 1 < len(segs)
                and segs[i + 1][0] == "literal"
                and prev_code_ok
            ):
                lit_operand = out.pop()  # the operand literal, verbatim
            else:
                out.append(text)
                i += 1
                continue
        operand = lit_operand if lit_operand is not None else m.group(1)
        path: list = [segs[i + 1][1][1:-1].replace("''", "'")]
        j = i + 2
        while j < len(segs):
            k2, t2 = segs[j]
            if k2 != "code":
                break
            mm = re.match(r"\s*(->>?)\s*$", t2)
            if mm and j + 1 < len(segs) and segs[j + 1][0] == "literal":
                path.append(segs[j + 1][1][1:-1].replace("''", "'"))
                j += 2
                continue
            mm2 = re.match(r"\s*(->>?)\s*(\d+)(?![\w.])", t2)
            if mm2:
                path.append(int(mm2.group(2)))
                segs[j] = ("code", t2[mm2.end() :])
                continue
            break
        if any(
            not isinstance(k, int) and not re.fullmatch(r"\w+", k)
            for k in path
        ):
            # non-identifier key: json-path quoting support differs per
            # engine — leave the text untouched to fail loudly rather
            # than rewrite into a corrupt path literal
            if lit_operand is not None:
                out.append(lit_operand)
            out.append(text)
            i += 1
            continue
        parts = [
            f"[{k}]" if isinstance(k, int) else f".{k}" for k in path
        ]
        prefix = "" if lit_operand is not None else text[: m.start()]
        out.append(
            prefix + f"get_json_object({operand}, '${''.join(parts)}')"
        )
        i = j
    return "".join(out)


_ARRAY_LIT = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)


def pg_array_literals(sql: str) -> str:
    """Rewrite PostgreSQL `ARRAY[a, b, ...]` constructor literals to
    Spark's `array(a, b, ...)` (nested literals handled by
    recursion). Plain bracket INDEXING (`a[1]`) is untouched — note
    the 1-based-vs-0-based indexing difference is a semantic gap this
    textual layer deliberately does not paper over."""
    spans = _masked_spans(sql)

    def in_code(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next((m for m in _ARRAY_LIT.finditer(sql) if in_code(m.start())), None)
    if m is None:
        return sql
    depth = 0
    i = m.end() - 1
    while i < len(sql):
        if in_code(i):
            if sql[i] == "[":
                depth += 1
            elif sql[i] == "]":
                depth -= 1
                if depth == 0:
                    break
        i += 1
    if depth != 0:
        raise ValueError("unbalanced brackets in ARRAY literal")
    inner = sql[m.end() : i]
    rewritten = f"{sql[: m.start()]}array({inner}){sql[i + 1 :]}"
    return pg_array_literals(rewritten)


def pg_array_contains_ops(sql: str) -> str:
    """Rewrite the PG array containment/overlap operators (none are
    valid Spark SQL — `&&` included, Spark's parser has no such
    token — so all three are unconditional):

        a @> b   →  forall(b, x -> array_contains(a, x))
        a <@ b   →  forall(a, x -> array_contains(b, x))
        a && b   →  arrays_overlap(a, b)

    Operands must be simple identifiers or call expressions with a
    simple argument list (the regress shapes); anything fancier is
    left to fail loudly."""
    operand = r"(?:[A-Za-z_][\w.]*\s*\([^()]*\)|[A-Za-z_][\w.]*)"
    pat = re.compile(
        rf"(?P<l>{operand})\s*(?P<op>@>|<@|&&)\s*(?P<r>{operand})"
    )

    def repl(m: re.Match) -> str:
        a, b = m.group("l"), m.group("r")
        if m.group("op") == "&&":
            return f"arrays_overlap({a}, {b})"
        if m.group("op") == "<@":
            a, b = b, a
        return f"forall({b}, x -> array_contains({a}, x))"

    return _map_code(sql, lambda s: pat.sub(repl, s))


_GEN_SERIES = re.compile(r"\bgenerate_series\s*\(", re.IGNORECASE)


def _in_from_clause(sql: str, spans, pos: int) -> bool:
    """True when `pos` sits in the FROM clause of its OWN query scope:
    a per-depth clause tracker survives subqueries, so a select-list
    comma (`SELECT a, generate_series(...)`) is correctly rejected
    while a FROM-list comma qualifies."""
    kw = re.compile(
        r"(SELECT|FROM|WHERE|GROUP|HAVING|ORDER|LIMIT|JOIN)", re.IGNORECASE
    )
    depth = 0
    last: dict[int, str | None] = {0: None}
    j = 0
    while j < pos:
        if any(a <= j < b for a, b in spans):
            j += 1
            continue
        c = sql[j]
        if c == "(":
            depth += 1
            last[depth] = None
            j += 1
            continue
        if c == ")":
            last.pop(depth, None)
            depth = max(0, depth - 1)
            j += 1
            continue
        mkw = kw.match(sql, j)
        if mkw and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")):
            nxt = mkw.end()
            if nxt >= len(sql) or not (
                sql[nxt].isalnum() or sql[nxt] == "_"
            ):
                word = mkw.group(1).upper()
                last[depth] = "FROM" if word == "JOIN" else word
            j = mkw.end()
            continue
        j += 1
    return last.get(depth) == "FROM"


def pg_generate_series(sql: str) -> str:
    """Rewrite FROM-position `generate_series(a, b[, step])` to
    Spark's `(SELECT explode(sequence(a, b[, step])) AS
    generate_series)` (both ends inclusive in both engines). After a
    FROM-list comma or JOIN the subquery is wrapped in LATERAL so
    correlated bounds (`FROM t, generate_series(1, t.n)`) stay legal.
    PG also allows the call in the select list (a set-returning
    function); that position is left alone and fails loudly in Spark
    rather than being rewritten wrong. An `AS alias(col)` column
    rename is honored. All FROM-position occurrences rewrite, not
    just the first."""
    spans = _masked_spans(sql)

    def in_code(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next(
        (
            m
            for m in _GEN_SERIES.finditer(sql)
            if in_code(m.start()) and _in_from_clause(sql, spans, m.start())
        ),
        None,
    )
    if m is None:
        return sql
    head = sql[: m.start()].rstrip()
    lateral = not re.search(r"\bFROM\s*$", head, re.IGNORECASE)
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if in_code(i):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
        i += 1
    if depth != 0:
        raise ValueError("unbalanced parentheses in generate_series")
    args = sql[m.end() : i]
    rest = sql[i + 1 :]
    col = "generate_series"
    alias = ""
    am = re.match(
        r"\s*(?:AS\s+)?([A-Za-z_]\w*)(?:\s*\(\s*([A-Za-z_]\w*)\s*\))?",
        rest, re.IGNORECASE,
    )
    # don't swallow a following keyword as an alias
    if am and am.group(1).upper() not in (
        "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "CROSS",
        "INNER", "LEFT", "RIGHT", "FULL", "UNION", "INTERSECT", "EXCEPT",
        "HAVING", "AS",
    ):
        alias = f" {am.group(1)}"
        if am.group(2):
            col = am.group(2)
        rest = rest[am.end() :]
    lat = "LATERAL " if lateral else ""
    rewritten = (
        f"{sql[: m.start()]}{lat}(SELECT explode(sequence({args})) AS {col})"
        f"{alias}{rest}"
    )
    return pg_generate_series(rewritten)


def _masked_spans(sql: str) -> list[tuple[int, int]]:
    return [(m.start(), m.end()) for m in _SEGMENT.finditer(sql)]


def _code_iter(sql: str, start: int, spans) -> "list[int]":
    """Indices of code characters from `start` on (skipping literal
    and comment spans)."""
    idx = []
    si = 0
    for i in range(start, len(sql)):
        while si < len(spans) and spans[si][1] <= i:
            si += 1
        if si < len(spans) and spans[si][0] <= i < spans[si][1]:
            continue
        idx.append(i)
    return idx


def _split_top_level(text: str) -> list[str]:
    """Split on top-level commas (paren- AND bracket-depth 0, outside
    literals — a comma inside ARRAY[...] is part of the literal, not a
    separator)."""
    spans = _masked_spans(text)
    parts, depth, last = [], 0, 0
    for i in _code_iter(text, 0, spans):
        c = text[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return [p.strip() for p in parts if p.strip()]


def _strip_alias(item: str) -> str:
    return re.sub(r"\s+AS\s+[A-Za-z_]\w*\s*$", "", item, flags=re.IGNORECASE)


def _out_name(item: str) -> str:
    """Output column name of a select-list item (alias, else the last
    identifier path segment)."""
    m = re.search(r"\s+AS\s+([A-Za-z_]\w*)\s*$", item, re.IGNORECASE)
    if m:
        return m.group(1)
    m = re.search(r"([A-Za-z_]\w*)\s*$", item)
    return m.group(1) if m else item.strip()


def rewrite_distinct_on(sql: str) -> str:
    """Rewrite PostgreSQL `SELECT DISTINCT ON (keys) list … ORDER BY …`
    to the row_number() formulation Spark executes natively
    (↔ reference src/test/regress/sql/multi_select_distinct.sql —
    Citus pushes DISTINCT ON into worker queries when grouped by the
    distribution column; here the window's PARTITION BY plays that
    role, shuffling once on the keys):

        SELECT * EXCEPT (__citus_rn) FROM (
          SELECT <list>, row_number() OVER (
            PARTITION BY <keys> ORDER BY <order-by>) AS __citus_rn
          FROM <tail>) __citus_don
        WHERE __citus_rn = 1 [ORDER BY <outer items>] [LIMIT …]

    Ordinal keys/order items resolve against the select list (the
    regress scripts' dominant spelling). Outer ordering is COMPLETE:
    order-by expressions that are not select-list outputs are carried
    through the subquery as hidden `__citus_obN` columns and excluded
    from the final projection, so `ORDER BY key, ts DESC LIMIT n`
    selects exactly PG's rows even when `ts` isn't projected. A
    DISTINCT ON inside a CTE or subquery rewrites in place: the tail
    scan stops when the enclosing scope closes (paren depth goes
    negative) and the remainder of the statement is preserved."""
    pat = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)
    spans = _masked_spans(sql)

    def in_code(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next((m for m in pat.finditer(sql) if in_code(m.start())), None)
    if m is None:
        return sql
    # 1. keys: balanced-paren scan from the opening '('
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if in_code(i):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
        i += 1
    if depth != 0:
        raise ValueError("unbalanced parentheses in DISTINCT ON")
    keys_text = sql[m.end() : i]
    # 2. select list: up to the top-level FROM
    rest_start = i + 1
    depth = 0
    from_pos = None
    kw_from = re.compile(r"\bFROM\b", re.IGNORECASE)
    for j in _code_iter(sql, rest_start, spans):
        c = sql[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c in "Ff":
            k = kw_from.match(sql, j)
            if k:
                from_pos = j
                break
    if from_pos is None:
        raise ValueError("DISTINCT ON without FROM")
    select_list = sql[rest_start:from_pos].strip()
    # 3. tail: split out top-level ORDER BY and LIMIT/OFFSET, stopping
    # where the ENCLOSING scope closes (depth < 0 means this DISTINCT
    # ON lives inside a CTE/subquery — everything after the close
    # belongs to the outer statement and is carried through verbatim)
    tail = sql[from_pos:]
    tail_spans = _masked_spans(tail)
    depth = 0
    ob_pos = lim_pos = None
    scope_end = len(tail)
    kw_ob = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
    kw_lim = re.compile(r"\b(LIMIT|OFFSET|FETCH)\b", re.IGNORECASE)
    for j in _code_iter(tail, 0, tail_spans):
        c = tail[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                scope_end = j
                break
        elif depth == 0:
            if ob_pos is None and c in "Oo" and kw_ob.match(tail, j):
                ob_pos = j
            if lim_pos is None and c in "LlOoFf" and kw_lim.match(tail, j):
                if ob_pos is None or j > ob_pos:
                    lim_pos = j
    scope_suffix = tail[scope_end:]
    tail = tail[:scope_end]
    if ob_pos is not None:
        from_part = tail[:ob_pos].rstrip()
        ob_text = tail[ob_pos : lim_pos if lim_pos else len(tail)]
        ob_text = re.sub(
            r"^\s*ORDER\s+BY\s*", "", ob_text, flags=re.IGNORECASE
        ).strip().rstrip(";")
        limit_tail = tail[lim_pos:] if lim_pos else ""
    else:
        from_part = tail[: lim_pos if lim_pos else len(tail)].rstrip()
        ob_text = ""
        limit_tail = tail[lim_pos:] if lim_pos else ""
    from_part = from_part.rstrip().rstrip(";")
    limit_tail = limit_tail.rstrip().rstrip(";")

    sl_items = _split_top_level(select_list)

    def split_dir(raw: str) -> tuple[str, str]:
        """('expr', ' DESC NULLS LAST') — direction/nulls suffix off."""
        raw = raw.strip()
        dm = re.search(r"\s+(ASC|DESC|NULLS)\b.*$", raw, re.IGNORECASE)
        if dm:
            return raw[: dm.start()], raw[dm.start() :]
        return raw, ""

    def resolve(item: str) -> str:
        body, suffix = split_dir(item)
        if re.fullmatch(r"\d+", body):
            n = int(body)
            if not (1 <= n <= len(sl_items)):
                raise ValueError(f"ORDER BY position {n} out of range")
            return _strip_alias(sl_items[n - 1]) + suffix
        return item.strip()

    keys = [resolve(k) for k in _split_top_level(keys_text)]
    ob_items = [resolve(o) for o in _split_top_level(ob_text)] if ob_text else []
    win_order = ob_items if ob_items else keys
    # only names the OUTER scope can actually reference: an explicit
    # alias, or an item that IS a bare column path. An unaliased
    # EXPRESSION item (`l_orderkey + 1`) surfaces under Spark's pretty
    # name `(l_orderkey + 1)` — the raw expression text cannot be
    # re-evaluated outside the subquery (base columns are gone), so
    # order items matching it must travel as hidden __citus_obN
    # columns like any unprojected expression. The shape test is on
    # the ITEM, not _out_name's last-identifier fallback (which would
    # claim `y` as an output name of `x - y` — review fix).
    out_names = set()
    alias_expr: dict[str, str] = {}
    for s_item in sl_items:
        s_item = s_item.strip()
        am = re.search(r"\s+AS\s+([A-Za-z_]\w*)\s*$", s_item, re.IGNORECASE)
        if am:
            out_names.add(am.group(1))
            alias_expr[am.group(1)] = s_item[: am.start()].strip()
            continue
        if re.fullmatch(r"[A-Za-z_][\w.]*", s_item):
            out_names.add(s_item.split(".")[-1])
            continue
        # implicit alias (`count(*) n`, `c_name cn`): a trailing bare
        # identifier whose preceding token CLOSES an expression —
        # never after an operator character or a word operator, where
        # the identifier is an operand (`x - y`, `a AND b`)
        im = re.fullmatch(r"(.+?)\s+([A-Za-z_]\w*)", s_item, re.DOTALL)
        if im:
            head = im.group(1).rstrip()
            last_word = re.search(r"([A-Za-z_]\w*)$", head)
            word_ops = {
                "and", "or", "not", "is", "like", "ilike", "in",
                "between", "escape", "collate", "from", "distinct",
                "similar", "to", "when", "then", "else", "case",
            }
            if head and (
                head[-1] in ")]'\"" or head[-1].isalnum() or head[-1] == "_"
            ) and not (
                last_word and last_word.group(1).lower() in word_ops
            ):
                out_names.add(im.group(2))
                alias_expr[im.group(2)] = head
    # the window spec evaluates in the INNER scope, where a select-list
    # alias is only a lateral reference — Spark forbids those inside
    # window expressions (LATERAL_COLUMN_ALIAS_IN_WINDOW), so window
    # order items naming an alias substitute its expression
    win_resolved = []
    for w in win_order:
        wb, ws = split_dir(w)
        win_resolved.append(
            alias_expr[wb] + ws if wb in alias_expr else w
        )
    win_order = win_resolved
    # outer ORDER BY must be COMPLETE or LIMIT selects different rows:
    # items not visible among the outputs are carried through the
    # subquery as hidden columns and excluded from the projection
    outer_ob: list[str] = []
    hidden: list[str] = []
    for raw in _split_top_level(ob_text) if ob_text else []:
        body, suffix = split_dir(raw)
        if re.fullmatch(r"\d+", body) or body in out_names:
            outer_ob.append(raw.strip())
        else:
            alias = f"__citus_ob{len(hidden)}"
            hidden.append(f"{resolve(body)} AS {alias}")
            outer_ob.append(f"{alias}{suffix}")
    hidden_sql = (", " + ", ".join(hidden)) if hidden else ""
    except_cols = ", ".join(
        ["__citus_rn"] + [h.split(" AS ")[-1] for h in hidden]
    )
    inner = (
        f"SELECT {select_list}{hidden_sql}, row_number() OVER ("
        f"PARTITION BY {', '.join(keys)} "
        f"ORDER BY {', '.join(win_order)}) AS __citus_rn\n{from_part}"
    )
    rewritten = (
        f"{sql[: m.start()]}SELECT * EXCEPT ({except_cols}) FROM (\n{inner}\n"
        f") __citus_don WHERE __citus_rn = 1"
    )
    if outer_ob:
        rewritten += f" ORDER BY {', '.join(outer_ob)}"
    if limit_tail:
        rewritten += f" {limit_tail}"
    rewritten += scope_suffix
    # recurse: a further DISTINCT ON (e.g. in a set-op branch)
    return rewrite_distinct_on(rewritten)


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
    # PG admits length-less char types (CAST(x AS VARCHAR) =
    # unbounded); Spark requires a length — map to STRING, the
    # unbounded type. The `)` lookahead keeps VARCHAR(10) and quoted
    # aliases untouched; the CAST-context check keeps a column ALIAS
    # literally named char/varchar at the end of a parenthesized
    # subquery untouched (ADVICE r10). Applied over the REJOINED
    # statement (not per segment) so a string-literal operand —
    # CAST('abc' AS VARCHAR) — doesn't split the paren pairing
    # (review fix); literal spans are masked internally.
    return bare_char_cast_to_string("".join(out))


_BARE_CHAR_TYPE = re.compile(
    r"\b(AS\s+)(?:VARCHAR|CHARACTER\s+VARYING|CHAR|CHARACTER)(?=\s*\))",
    re.IGNORECASE,
)

_CAST_HEAD = re.compile(r"\b(?:CAST|TRY_CAST)\s*$", re.IGNORECASE)


def bare_char_cast_to_string(text: str) -> str:
    """Apply the length-less char-type → STRING mapping ONLY where the
    `AS VARCHAR)` sits inside a CAST(...)/TRY_CAST(...) call: the close
    paren after the type must pair with an open paren immediately
    preceded by the CAST keyword. Anything else — e.g. a column alias
    named char/varchar closing a parenthesized subquery — is left
    alone.

    Operates on the WHOLE statement, masking literal/comment spans for
    both the keyword match and the paren pairing — a segment-scoped
    scan would lose the open paren of `CAST('abc' AS VARCHAR)` to the
    literal split and silently skip the rewrite (review fix)."""
    matches = [
        m for m in _BARE_CHAR_TYPE.finditer(text)
    ]
    if not matches:
        return text
    spans = _masked_spans(text)

    def masked(i: int) -> bool:
        return any(a <= i < b for a, b in spans)

    stack: list[int] = []
    open_of: dict[int, int] = {}
    for i, c in enumerate(text):
        if masked(i):
            continue
        if c == "(":
            stack.append(i)
        elif c == ")" and stack:
            open_of[i] = stack.pop()
    out: list[str] = []
    last = 0
    for m in matches:
        if masked(m.start()):
            continue
        j = m.end()
        while j < len(text) and text[j].isspace():
            j += 1
        op = open_of.get(j)
        if op is None or not _CAST_HEAD.search(text[:op]):
            continue
        out.append(text[last:m.start()])
        out.append(m.group(1) + "STRING")
        last = m.end()
    out.append(text[last:])
    return "".join(out)


# ---------------------------------------------------------------------------
# PG 13 `FETCH FIRST n ROWS WITH TIES` (↔ reference
# src/test/regress/sql/pg13_with_ties.sql — Citus plans it by pushing
# the windowed form to workers). No LIMIT spelling exists in Spark, so
# the block rewrites to the rank() formulation the reference itself
# uses for the distributed plan:
#
#   SELECT <list> ... ORDER BY <keys> FETCH FIRST n ROWS WITH TIES
#     →
#   SELECT * EXCEPT (__citus_rk) FROM (
#     SELECT <list>, rank() OVER (ORDER BY <keys>) AS __citus_rk ...
#   ) __citus_wt WHERE __citus_rk <= n ORDER BY __citus_rk
#
# rank() assigns equal values to ties, so every peer of the n-th row
# survives — exactly WITH TIES. ORDER BY ordinals and select-list
# aliases resolve to their expressions (a window spec can reference
# neither). The single global window IS the semantic cost of WITH
# TIES itself (a global order); Spark plans the n-filter with a
# WindowGroupLimit pushdown, so no full materialization happens.
_FETCH_TIES = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(?P<n>\d+\s+)?ROWS?\s+WITH\s+TIES",
    re.IGNORECASE,
)


def rewrite_fetch_with_ties(sql: str) -> str:
    spans = _masked_spans(sql)

    def in_code(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next((x for x in _FETCH_TIES.finditer(sql) if in_code(x.start())), None)
    if m is None:
        return sql
    n = (m.group("n") or "1").strip()
    # the enclosing block's SELECT and ORDER BY: last seen at the
    # paren depth where the FETCH itself sits
    depth = 0
    sel: dict[int, int] = {}
    ob: dict[int, int] = {}
    kw_sel = re.compile(r"\bSELECT\b", re.IGNORECASE)
    kw_ob = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
    for j in _code_iter(sql, 0, spans):
        if j >= m.start():
            break
        c = sql[j]
        if c == "(":
            depth += 1
        elif c == ")":
            sel.pop(depth, None)
            ob.pop(depth, None)
            depth -= 1
        elif c in "Ss" and kw_sel.match(sql, j):
            sel[depth] = j
        elif c in "Oo" and kw_ob.match(sql, j):
            ob[depth] = j
    if depth not in sel:
        raise ValueError("FETCH .. WITH TIES without an enclosing SELECT")
    if depth not in ob:
        # same restriction as PostgreSQL itself
        raise ValueError("WITH TIES cannot be specified without ORDER BY")
    sel_pos, ob_pos = sel[depth], ob[depth]
    between = sql[ob_pos : m.start()]
    if re.search(r"\bOFFSET\b|\bLIMIT\b", between, re.IGNORECASE):
        raise ValueError("OFFSET/LIMIT combined with WITH TIES is not supported")
    if re.match(r"SELECT\s+DISTINCT\b", sql[sel_pos:], re.IGNORECASE):
        raise ValueError("SELECT DISTINCT with WITH TIES is not supported")
    ob_text = re.sub(
        r"^\s*ORDER\s+BY\s*", "", between, flags=re.IGNORECASE
    ).strip().rstrip(";")
    body = sql[sel_pos:ob_pos]
    bspans = _masked_spans(body)
    d2 = 0
    from_pos = None
    kw_from = re.compile(r"\bFROM\b", re.IGNORECASE)
    for j in _code_iter(body, 0, bspans):
        c = body[j]
        if c == "(":
            d2 += 1
        elif c == ")":
            d2 -= 1
        elif d2 == 0 and c in "Ff" and kw_from.match(body, j):
            from_pos = j
            break
    sl_end = from_pos if from_pos is not None else len(body)
    sl_items = _split_top_level(body[len("SELECT") : sl_end])
    alias_expr = {
        _out_name(s): _strip_alias(s)
        for s in sl_items
        if s.strip() != "*" and not s.strip().endswith(".*")
    }

    def resolve(item: str) -> str:
        raw = item.strip()
        dm = re.search(r"\s+(ASC|DESC|NULLS)\b.*$", raw, re.IGNORECASE)
        head, suffix = (
            (raw[: dm.start()], raw[dm.start() :]) if dm else (raw, "")
        )
        head = head.strip()
        if re.fullmatch(r"\d+", head):
            k = int(head)
            if not (1 <= k <= len(sl_items)):
                raise ValueError(f"ORDER BY position {k} out of range")
            return _strip_alias(sl_items[k - 1]) + suffix
        if head in alias_expr:
            return alias_expr[head] + suffix
        return raw

    ob_items = [resolve(o) for o in _split_top_level(ob_text)]
    inner = (
        body[:sl_end].rstrip()
        + f", rank() OVER (ORDER BY {', '.join(ob_items)}) AS __citus_rk\n"
        + (body[sl_end:] if from_pos is not None else "")
    )
    out = (
        f"{sql[:sel_pos]}SELECT * EXCEPT (__citus_rk) FROM (\n{inner}\n"
        f") __citus_wt WHERE __citus_rk <= {n} ORDER BY __citus_rk"
        f"{sql[m.end():]}"
    )
    # recurse: a further WITH TIES in another block (e.g. a CTE)
    return rewrite_fetch_with_ties(out)


# ANSI OFFSET .. FETCH — the standard's LIMIT spelling (PG regress
# uses it alongside LIMIT). Spark only parses `LIMIT n OFFSET m`, so:
#   OFFSET n ROWS FETCH {FIRST|NEXT} m ROWS ONLY  →  LIMIT m OFFSET n
#   FETCH FIRST [m] ROWS ONLY                     →  LIMIT m (1 if absent)
#   OFFSET n ROWS (alone)                         →  OFFSET n
# WITH TIES rewrites above (rank() formulation) before this pass runs;
# the raise below is a safety net for shapes the rewrite rejected.
_FETCH_FIRST = re.compile(
    r"(?:\bOFFSET\s+(?P<off>\d+)\s+ROWS?\s+)?"
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(?P<n>\d+\s+)?"
    r"ROWS?\s+(?:(?P<only>ONLY)|(?P<ties>WITH\s+TIES))",
    re.IGNORECASE,
)
_OFFSET_ROWS = re.compile(r"\bOFFSET\s+(\d+)\s+ROWS?\b", re.IGNORECASE)


def pg_fetch_first(sql: str) -> str:
    sql = rewrite_fetch_with_ties(sql)

    def fix(code: str) -> str:
        def repl(m: re.Match) -> str:
            if m.group("ties"):
                raise ValueError(
                    "FETCH .. WITH TIES is not supported — express it "
                    "as rank() OVER (ORDER BY ...) <= n"
                )
            n = (m.group("n") or "1").strip()
            off = m.group("off")
            return f"LIMIT {n}" + (f" OFFSET {off}" if off else "")

        code = _FETCH_FIRST.sub(repl, code)
        return _OFFSET_ROWS.sub(r"OFFSET \1", code)

    return _map_code(sql, fix)


# PG TABLESAMPLE methods: SYSTEM/BERNOULLI (pct). Spark's sampler is
# the same Bernoulli row sample spelled `(pct PERCENT)`; REPEATABLE
# passes through unchanged (both grammars accept it).
_PG_TABLESAMPLE = re.compile(
    r"\bTABLESAMPLE\s+(?:SYSTEM|BERNOULLI)\s*\(\s*(\d+(?:\.\d+)?)\s*\)",
    re.IGNORECASE,
)


def pg_tablesample(sql: str) -> str:
    return _map_code(
        sql, lambda c: _PG_TABLESAMPLE.sub(r"TABLESAMPLE (\1 PERCENT)", c)
    )


# SQL `SIMILAR TO` — the standard's regex-flavored LIKE (PG docs
# §9.7.2): % → .*, _ → . and the remaining metacharacters ( ) | [ ]
# * + ? { } are already POSIX regex, anchored at both ends. Only
# literal patterns rewrite (a computed pattern would need the
# translation at run time); the literal is the NEXT segment after the
# operator, so this pass walks segments directly.
_SIMILAR_TAIL = re.compile(r"(\bNOT\s+)?\bSIMILAR\s+TO\s*$", re.IGNORECASE)


def _similar_pattern_to_regex(lit: str) -> str:
    # Backslashes emitted below are DOUBLED because the output is a
    # Spark SQL string literal and Spark's default literal parsing
    # consumes one level of escaping ('\.' in a literal is just '.');
    # the doubled form reaches the regex engine as the intended \x.
    body = lit[1:-1]  # keep '' escapes — they stay valid in the output
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch == "\\" and i + 1 < len(body):
            out.append("\\\\" + body[i + 1])  # SIMILAR TO escape → regex escape
            i += 2
            continue
        elif ch == ".":
            out.append("\\\\.")  # literal dot in SIMILAR TO, meta in regex
        else:
            out.append(ch)
        i += 1
    return "'^(?:" + "".join(out) + ")$'"


def pg_similar_to(sql: str) -> str:
    segs = _segments(sql)
    out: list[str] = []
    i = 0
    while i < len(segs):
        kind, text = segs[i]
        m = _SIMILAR_TAIL.search(text) if kind == "code" else None
        if m and i + 1 < len(segs) and segs[i + 1][0] == "literal":
            neg = "NOT " if m.group(1) else ""
            out.append(text[: m.start()])
            out.append(f" {neg}rlike ")
            out.append(_similar_pattern_to_regex(segs[i + 1][1]))
            i += 2
            continue
        if m:
            raise ValueError(
                "SIMILAR TO with a non-literal pattern is not supported"
            )
        out.append(text)
        i += 1
    return "".join(out)


# PG row-locking clauses — `FOR {UPDATE|NO KEY UPDATE|SHARE|KEY SHARE}
# [OF t, ...] [NOWAIT | SKIP LOCKED]` (↔ reference
# src/test/regress/sql/multi_select_for_update.sql: Citus routes these
# to single shards and takes real row locks). This engine executes
# every statement against one immutable snapshot (copy-on-write DML),
# so there is nothing to lock: the clause is accepted and stripped,
# the SQL-standard behavior for a serializable read-only snapshot.
# NOWAIT/SKIP LOCKED change which rows a *blocked* reader sees — with
# no writers inside a snapshot, both degenerate to the full result.
_FOR_LOCK = re.compile(
    r"\bFOR\s+(?:NO\s+KEY\s+)?(?:UPDATE|SHARE)(?:\s+OF\s+"
    r"[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)?"
    r"(?:\s+NOWAIT|\s+SKIP\s+LOCKED)?",
    re.IGNORECASE,
)


def pg_row_locking(sql: str) -> str:
    return _map_code(sql, lambda c: _FOR_LOCK.sub("", c))


# PG array subscripting — `arr[i]` and slices `arr[lo:hi]`
# (↔ reference src/test/regress/sql/subscripting_op.sql). PG is
# 1-based; Spark's native bracket subscript is 0-BASED, so the same
# spelling silently means a different element — which is why this
# rewrite is pg_compat-GATED (the only rewrites allowed to fire
# unconditionally are ones whose input is invalid Spark SQL).
#   arr[i]      → element_at(arr, i)        (1-based, like PG)
#   arr[lo:hi]  → slice(arr, lo, hi-lo+1)   (inclusive ends, like PG)
# The base must be an identifier path or a closing paren/bracket
# (function call or chained subscript); numeric literals never
# rewrite (`a[1]` yes, `1[1]` no). Chains apply left-to-right.
_SUBSCRIPT = re.compile(
    r"(?P<base>[A-Za-z_][\w.]*|\))\s*\[\s*(?P<lo>[^\[\]:]+?)"
    r"(?:\s*:\s*(?P<hi>[^\[\]:]+?))?\s*\]"
)
_KW_NO_SUB = {"array", "values", "in", "and", "or", "not", "then", "else"}


def pg_subscripts(sql: str) -> str:
    def fix(code: str) -> str:
        changed = True
        while changed:
            changed = False
            for m in _SUBSCRIPT.finditer(code):
                base = m.group("base")
                if base.lower() in _KW_NO_SUB:
                    continue
                if base == ")":
                    # function-call base: balanced backscan from the
                    # ')' to the matching '(' plus the callee name
                    depth = 0
                    j = m.start()
                    while j >= 0:
                        if code[j] == ")":
                            depth += 1
                        elif code[j] == "(":
                            depth -= 1
                            if depth == 0:
                                break
                        j -= 1
                    if j < 0:
                        raise ValueError(
                            "array subscript base spans a string "
                            "literal or segment boundary — rewrite it "
                            "as element_at()/slice() directly"
                        )
                    k = j - 1
                    while k >= 0 and (code[k].isalnum() or code[k] in "._"):
                        k -= 1
                    expr_start = k + 1
                    expr = code[expr_start : m.start() + 1]
                else:
                    expr_start = m.start()
                    expr = base
                lo = m.group("lo").strip()
                hi = m.group("hi")
                if hi is None:
                    new = f"element_at({expr}, {lo})"
                else:
                    hi = hi.strip()
                    new = f"slice({expr}, {lo}, ({hi}) - ({lo}) + 1)"
                code = code[:expr_start] + new + code[m.end() :]
                changed = True
                break
        return code

    return _map_code(sql, fix)


# PG/SQL:2016 jsonpath functions (↔ reference pg15_jsonpath.sql /
# pg17_json.sql regress). Spark's get_json_object speaks the same
# `$.a.b[0]` path dialect for the member/element subset — the only
# subset these rewrites accept (filters `?()`, wildcards and `**`
# raise). Mapping:
#   jsonb_path_exists(j, 'p')       → get_json_object(j, 'p') IS NOT NULL
#   jsonb_path_query_first(j, 'p')  → get_json_object(j, 'p')
#   jsonb_path_match(j, 'p')        → CAST(get_json_object(j, 'p') AS BOOLEAN)
# (json_* spellings accepted too; @? / @@ operators rewrite to the
# same forms.)
_JSONPATH_FN = re.compile(
    r"\b(?P<fn>jsonb?_path_(?:exists|match|query_first))\s*\(",
    re.IGNORECASE,
)


def _jsonpath_guard(path_lit: str) -> str:
    body = path_lit[1:-1]
    if any(tok in body for tok in ("?", "*", "@", " filter")):
        raise ValueError(
            f"jsonpath {path_lit} uses filter/wildcard syntax — only "
            "member/element paths ($.a.b[0]) are supported"
        )
    return path_lit


def pg_jsonpath(sql: str) -> str:
    start = 0
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                x
                for x in _JSONPATH_FN.finditer(sql, start)
                if not any(a <= x.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return sql
        # balanced forward scan to the call's closing paren (literal
        # spans — including literals INSIDE the first argument — skip
        # wholesale), then a top-level-comma split of the arguments
        depth, i = 0, m.end() - 1
        while i < len(sql):
            sp = next((s for s in spans if s[0] <= i < s[1]), None)
            if sp:
                i = sp[1]
                continue
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            raise ValueError(f"unbalanced parens in {m.group('fn')}")
        args = _split_top_level(sql[m.end() : i])
        if len(args) != 2 or not re.fullmatch(
            r"'(?:[^']|'')*'", args[1].strip()
        ):
            raise ValueError(
                f"{m.group('fn')} requires (expr, 'literal jsonpath')"
            )
        arg1 = args[0].strip()
        path = _jsonpath_guard(args[1].strip())
        fn = m.group("fn").lower()
        if fn.endswith("exists"):
            expr = f"(get_json_object({arg1}, {path}) IS NOT NULL)"
        elif fn.endswith("match"):
            expr = f"CAST(get_json_object({arg1}, {path}) AS BOOLEAN)"
        else:
            expr = f"get_json_object({arg1}, {path})"
        sql = sql[: m.start()] + expr + sql[i + 1 :]
        start = m.start() + len(expr)


# @? (path exists) and @@ (path match) operator spellings: the
# jsonpath literal is the right operand.
_JSONPATH_OP_TAIL = re.compile(r"@(\?|@)\s*$")


def pg_jsonpath_ops(sql: str) -> str:
    segs = _segments(sql)
    out: list[str] = []
    i = 0
    while i < len(segs):
        kind, text = segs[i]
        m = _JSONPATH_OP_TAIL.search(text) if kind == "code" else None
        if m and i + 1 < len(segs) and segs[i + 1][0] == "literal":
            # left operand: the trailing identifier path before the op
            lhs_m = re.search(r"([A-Za-z_][\w.]*)\s*$", text[: m.start()])
            if lhs_m is None:
                raise ValueError("@?/@@ needs a simple column left operand")
            path = _jsonpath_guard(segs[i + 1][1])
            col = lhs_m.group(1)
            if m.group(1) == "?":
                expr = f"(get_json_object({col}, {path}) IS NOT NULL)"
            else:
                expr = f"CAST(get_json_object({col}, {path}) AS BOOLEAN)"
            out.append(text[: lhs_m.start()])
            out.append(expr)
            i += 2
            continue
        out.append(text)
        i += 1
    return "".join(t for t in out)


# PG ordered-set aggregation — `array_agg(expr ORDER BY key [DESC])`
# and `string_agg(expr, delim ORDER BY key [DESC])` (↔ reference
# regress uses them everywhere, e.g.
# multi_behavioral_analytics_basics.sql funnel queries). Spark's
# aggregate functions take no ORDER BY; the standard distributed
# formulation collects (key, value) structs and sorts INSIDE the
# aggregated array — one aggregation, the sort is per-group local:
#   array_agg(e ORDER BY k)        → transform(array_sort(
#       array_agg(struct(k, e)), cmp), s -> s.col2-ish)
#   string_agg(e, d ORDER BY k)    → array_join(<same>, d)
# Multiple ORDER BY keys, DISTINCT, and NULLS FIRST/LAST are rejected
# loudly. NULL elements: Spark's array_agg drops NULL inputs while
# PG keeps them (pre-existing engine divergence, documented).
_ORDERED_AGG = re.compile(r"\b(array_agg|string_agg)\s*\(", re.I)


def _next_call(sql: str, pattern, start: int):
    """Find the next unmasked `pattern` match (its regex must end at
    the call's opening paren) and the index of its matching close
    paren. → (match, close_idx, spans) or (None, -1, spans). The ONE
    implementation of the find-call + balanced-scan idiom the
    function rewrites share."""
    spans = _masked_spans(sql)
    m = next(
        (
            x
            for x in pattern.finditer(sql, start)
            if not any(a <= x.start() < b for a, b in spans)
        ),
        None,
    )
    if m is None:
        return None, -1, spans
    depth, i = 0, m.end() - 1
    while i < len(sql):
        sp = next((s for s in spans if s[0] <= i < s[1]), None)
        if sp:
            i = sp[1]
            continue
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return m, i, spans
        i += 1
    raise ValueError(f"unbalanced parens in {m.group(0)}")


def pg_ordered_agg(sql: str) -> str:
    start = 0
    while True:
        m, i, spans = _next_call(sql, _ORDERED_AGG, start)
        if m is None:
            return sql
        inner = sql[m.end() : i]
        # first UNMASKED ORDER BY inside the call (a delimiter literal
        # may itself contain the words 'order by')
        om = next(
            (
                x
                for x in re.finditer(r"\bORDER\s+BY\b", inner, re.I)
                if not any(
                    a <= m.end() + x.start() < b for a, b in spans
                )
            ),
            None,
        )
        if om is None:
            start = i + 1
            continue  # unordered form: Spark-native
        head, tail = inner[: om.start()], inner[om.end() :]
        dm = re.match(r"\s*DISTINCT\b", head, re.I)
        distinct = bool(dm)
        if distinct:
            head = head[dm.end() :]
        keys = _split_top_level(tail)
        if len(keys) != 1:
            raise ValueError(
                f"{m.group(1)} ORDER BY supports one sort key "
                f"(got {len(keys)})"
            )
        key = keys[0].strip().rstrip(";")
        if re.search(r"\bNULLS\s+(FIRST|LAST)\b", key, re.I):
            raise ValueError(
                f"{m.group(1)} ORDER BY NULLS FIRST/LAST is not supported"
            )
        desc = bool(re.search(r"\s+DESC\s*$", key, re.I))
        key = re.sub(r"\s+(ASC|DESC)\s*$", "", key, flags=re.I)
        args = _split_top_level(head)
        fn = m.group(1).lower()
        if fn == "string_agg":
            if len(args) != 2:
                raise ValueError("string_agg takes (expr, delimiter)")
            expr, delim = args[0].strip(), args[1].strip()
        else:
            if len(args) != 1:
                raise ValueError("array_agg takes one expression")
            expr, delim = args[0].strip(), None
        if distinct:
            # PG only allows DISTINCT with ORDER BY when the sort key
            # IS the aggregated expression ("in this case the ORDER BY
            # expression must match the DISTINCT argument") — enforce
            # the same rule, then aggregate struct-wrapped values
            # (array_agg drops bare NULLs; PG's keeps them) and sort
            # with explicit NULL placement (PG: ASC → NULLS LAST,
            # DESC → NULLS FIRST).
            def _norm(e: str) -> str:
                # case-fold and strip whitespace in CODE only — string
                # literals are values and must compare verbatim
                return "".join(
                    re.sub(r"\s+", "", t).lower() if k2 == "code" else t
                    for k2, t in _segments(e)
                )

            if _norm(key) != _norm(expr):
                raise ValueError(
                    f"{m.group(1)} DISTINCT requires the ORDER BY "
                    f"expression to match the aggregated expression "
                    f"(PG's own rule)"
                )
            cmp = (
                ", (l, r) -> CASE "
                "WHEN l.v IS NULL AND r.v IS NULL THEN 0 "
                + (
                    "WHEN l.v IS NULL THEN -1 WHEN r.v IS NULL THEN 1 "
                    "WHEN l.v > r.v THEN -1 "
                    "WHEN l.v < r.v THEN 1 ELSE 0 END"
                    if desc
                    else "WHEN l.v IS NULL THEN 1 WHEN r.v IS NULL THEN -1 "
                    "WHEN l.v < r.v THEN -1 "
                    "WHEN l.v > r.v THEN 1 ELSE 0 END"
                )
            )
            sorted_vals = (
                f"transform(array_sort(array_agg(DISTINCT "
                f"struct({expr} AS v)){cmp}), s -> s.v)"
            )
        else:
            # DESC comparator: NULL keys sort FIRST (PG's default for
            # DESC); the plain CASE would return NULL (≡ 0, arbitrary
            # placement) for them. ASC keeps array_sort's natural struct
            # order — NULL-key placement there follows Spark, and ties
            # break by the value field (both documented).
            cmp = (
                ", (l, r) -> CASE "
                "WHEN l.k IS NULL AND r.k IS NULL THEN 0 "
                "WHEN l.k IS NULL THEN -1 WHEN r.k IS NULL THEN 1 "
                "WHEN l.k > r.k THEN -1 "
                "WHEN l.k < r.k THEN 1 ELSE 0 END"
                if desc
                else ""
            )
            sorted_vals = (
                f"transform(array_sort(array_agg(struct({key} AS k, "
                f"{expr} AS v)){cmp}), s -> s.v)"
            )
        repl = (
            f"array_join({sorted_vals}, {delim})"
            if delim is not None
            else sorted_vals
        )
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


# PG array_length(arr, dim) — Spark spells it size(), except that PG
# returns NULL for an EMPTY array (no dimension 1) where size()
# returns 0: nullif preserves the PG branch behavior. Only
# one-dimensional arrays exist here (dim must be the literal 1).
_ARRAY_LENGTH = re.compile(r"\barray_length\s*\(", re.I)


def pg_array_length(sql: str) -> str:
    start = 0
    while True:
        m, i, _ = _next_call(sql, _ARRAY_LENGTH, start)
        if m is None:
            return sql
        args = _split_top_level(sql[m.end() : i])
        if len(args) != 2:
            raise ValueError("array_length takes (array, dimension)")
        if args[1].strip() != "1":
            raise ValueError(
                "array_length: only dimension 1 exists in this engine"
            )
        repl = f"nullif(size({args[0].strip()}), 0)"
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


# ---------------------------------------------------------------------------
# Quantified comparisons: <expr> <op> ANY/SOME/ALL (...) — PostgreSQL
# accepts subqueries AND arrays as the quantifier argument; Spark has
# neither spelling (↔ reference regress multi_hash_pruning.sql:107
# `l_orderkey = ANY ('{1,2,3}')`, multi_real_time_transaction.sql:323
# `id = ANY(string_to_array(...))`).
#
#   = ANY (SELECT ...)      → IN (SELECT ...)
#   <> ALL (SELECT ...)     → NOT IN (SELECT ...)
#   x op ANY (array-expr)   → exists(array-expr, e -> x op e)
#   x op ALL (array-expr)   → forall(array-expr, e -> x op e)
#   x op ANY ('{a,b}')      → exists(array('a','b'), e -> x op e)
#   x op ANY (NULL)         → exists(CAST(NULL AS ARRAY<STRING>), ...)
#
# Spark's exists/forall use SQL three-valued logic (probed: a NULL
# element with no match yields NULL, matching PG exactly).
#
# Deliberately NOT claimed: ANY/SOME whose argument is a bare
# identifier — `true = any(flag_col)` is ALSO valid Spark SQL (the
# any() boolean aggregate), and without type information the rewrite
# cannot prove ownership; the text is left for Spark to resolve.
# ALL has no Spark homonym and is always claimed. Non-equality ops
# over subqueries (x > ANY (SELECT ...)) reject loudly.
_QUANTIFIED = re.compile(
    r"(<=|>=|<>|!=|=|<|>)\s*\b(ANY|SOME|ALL)\b\s*\(", re.I
)

_LEFT_KEYWORDS = {
    "and", "or", "not", "where", "when", "then", "else", "on", "select",
    "having", "by", "set", "case", "in", "like", "between", "is", "end",
}

# PG element-type names → Spark types for '{...}'::type[] literals;
# unmapped names reject loudly at rewrite time instead of failing
# deep inside Spark analysis with an unsupported-datatype error.
_PG_ELEM_TYPES = {
    "text": "STRING", "varchar": "STRING", "bpchar": "STRING",
    "char": "STRING", "name": "STRING", "string": "STRING",
    "int2": "SMALLINT", "smallint": "SMALLINT",
    "int4": "INT", "int": "INT", "integer": "INT",
    "int8": "BIGINT", "bigint": "BIGINT",
    "float4": "FLOAT", "real": "FLOAT",
    "float8": "DOUBLE", "double": "DOUBLE",
    "bool": "BOOLEAN", "boolean": "BOOLEAN",
    "date": "DATE", "timestamp": "TIMESTAMP",
}


def _left_operand(sql: str, spans, end: int) -> int:
    """Start index of the expression ending (exclusive) at `end`:
    a string literal, a balanced (...) group with an optional attached
    call name, or an identifier/number chain. Raises when ownership of
    a well-formed operand cannot be proven (a textual rewrite must
    never guess)."""
    j = end
    while j > 0 and sql[j - 1].isspace():
        j -= 1
    if j == 0:
        raise ValueError("quantified comparison: missing left operand")
    sp = next((s for s in spans if s[0] <= j - 1 < s[1]), None)
    if sp:  # string literal operand — include a typed-literal keyword
        # prefix (TIMESTAMP '...', DATE '...', ...) when present
        tm = re.search(
            r"\b(TIMESTAMP(?:_NTZ|_LTZ)?|DATE|TIME|INTERVAL|BINARY|X)"
            r"\s*$",
            sql[: sp[0]],
            re.I,
        )
        return tm.start() if tm else sp[0]
    if sql[j - 1] == ")":
        depth, i = 0, j - 1
        while i >= 0:
            sp = next((s for s in spans if s[0] <= i < s[1]), None)
            if sp:
                i = sp[0] - 1
                continue
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if depth != 0:
            raise ValueError("unbalanced parens before quantifier")
        m = re.search(r"[A-Za-z_][\w.]*\s*$", sql[:i])
        if m and m.group(0).strip().lower() not in _LEFT_KEYWORDS:
            return m.start()
        return i
    m = re.search(r"[\w.$]+$", sql[:j])
    if not m or m.group(0).lower() in _LEFT_KEYWORDS:
        raise ValueError(
            f"cannot determine the left operand of the quantified "
            f"comparison near: ...{sql[max(0, j - 30):j]!r}"
        )
    return m.start()


def _left_operand_chain(sql: str, spans, end: int) -> int:
    """Like _left_operand, but keeps consuming `<atom> <binary-op>`
    pairs leftward — comparison binds looser than arithmetic and
    concatenation in PG, so `a || b = ANY (...)` compares the WHOLE
    concatenation. A leading +/- with no atom before it is kept as a
    unary sign."""
    start = _left_operand(sql, spans, end)
    while True:
        j = start
        while j > 0 and sql[j - 1].isspace():
            j -= 1
        om = re.search(r"(\|\||[+*/%^-])$", sql[:j])
        if not om:
            return start
        try:
            start = _left_operand(sql, spans, om.start())
        except ValueError:
            if om.group(1) in ("+", "-"):
                return om.start()  # unary sign
            raise


def _pg_array_literal_to_spark(lit: str, cast_type: str | None) -> str:
    """'{a,b,c}' (PG array input syntax, simple elements only) →
    array('a','b','c') with optional per-element CAST."""
    body = lit.strip()[1:-1].replace("''", "'").strip()
    if not (body.startswith("{") and body.endswith("}")):
        raise ValueError(f"not a PG array literal: {lit}")
    inner = body[1:-1].strip()
    if not inner:
        return "array()"
    if '"' in inner or "{" in inner or "\\" in inner:
        raise ValueError(
            "PG array literals with quoted or nested elements are not "
            "supported — use ARRAY[...] syntax"
        )
    spark_type = None
    if cast_type:
        spark_type = _PG_ELEM_TYPES.get(cast_type.lower())
        if spark_type is None:
            raise ValueError(
                f"unsupported array element type {cast_type}[] — "
                f"supported: {', '.join(sorted(_PG_ELEM_TYPES))}"
            )
    els = []
    for el in inner.split(","):
        el = el.strip()
        # an unquoted NULL element is the SQL NULL value in PG's
        # array-input syntax (only "NULL" in double quotes is the word)
        e = "NULL" if el.upper() == "NULL" else (
            "'" + el.replace("'", "''") + "'"
        )
        els.append(f"CAST({e} AS {spark_type})" if spark_type else e)
    return f"array({', '.join(els)})"


def _looks_boolean(expr: str) -> bool:
    """True when the text has comparison or boolean syntax at the TOP
    level (paren depth 0, outside string literals) — the shape of an
    argument to Spark's any()/some() boolean aggregates. Comparisons
    nested inside calls (`array_remove(a, CASE WHEN x > 0 ...)`) are
    array-building detail and must not trip the carve-out."""
    top: list[str] = []
    depth = 0
    for kind, text in _segments(expr):
        if kind != "code":
            continue
        for ch in text:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                top.append(ch)
    code = "".join(top)
    return bool(
        re.search(
            r"[<>=]|\bAND\b|\bOR\b|\bNOT\b|\bIS\b|\bLIKE\b|\bBETWEEN\b",
            code,
            re.I,
        )
    )


def pg_quantified(sql: str) -> str:
    start = 0
    while True:
        m, i, spans = _next_call(sql, _QUANTIFIED, start)
        if m is None:
            return sql
        op, quant = m.group(1), m.group(2).upper()
        inner = sql[m.end() : i].strip()
        first_tok = re.match(r"[A-Za-z]+", inner)
        if first_tok and first_tok.group(0).upper() in (
            "SELECT", "WITH", "VALUES", "TABLE",
        ):
            # leading space: `k=ANY(...)` (no space before the
            # operator) must not glue into `kIN (...)`
            if quant in ("ANY", "SOME") and op == "=":
                repl = f" IN ({inner})"
            elif quant == "ALL" and op in ("<>", "!="):
                repl = f" NOT IN ({inner})"
            else:
                raise ValueError(
                    f"{op} {quant} (subquery) has no Spark equivalent "
                    f"— only = ANY and <> ALL subqueries are supported"
                )
            sql = sql[: m.start()] + repl + sql[i + 1 :]
            # resume INSIDE the inserted subquery text — it may itself
            # contain quantified comparisons that still need rewriting
            start = m.start() + repl.index("(") + 1
            continue
        # array-typed argument
        if inner.upper() == "NULL":
            arr = "CAST(NULL AS ARRAY<STRING>)"
        elif quant in ("ANY", "SOME") and (
            re.fullmatch(r"[A-Za-z_][\w.]*", inner)
            or _looks_boolean(inner)
        ):
            # Spark owns any()/some() as boolean aggregates: a bare
            # identifier could be a boolean column, and an argument
            # with top-level comparison/boolean syntax IS a boolean
            # expression (PG arrays are never built that way) —
            # ownership unprovable or clearly Spark's, leave it alone
            start = i + 1
            continue
        else:
            lit = re.fullmatch(r"('(?:[^']|'')*')\s*(?:::\s*(\w+)\s*\[\])?",
                               inner)
            if lit:
                arr = _pg_array_literal_to_spark(lit.group(1), lit.group(2))
            else:
                arr = inner
        left = _left_operand_chain(sql, spans, m.start())
        x = sql[left : m.start()].strip()
        fn = "forall" if quant == "ALL" else "exists"
        repl = f"{fn}({arr}, __citus_q -> ({x}) {op} __citus_q)"
        sql = sql[:left] + repl + sql[i + 1 :]
        # resume after the function name so quantifiers nested inside
        # the array argument or the operand are still rewritten
        start = left + len(fn) + 1


# ---------------------------------------------------------------------------
# AT TIME ZONE — PG's zone-conversion operator; Spark spells the two
# directions as functions. This engine's timestamps are naive
# (timestamp-without-tz, UTC session zone), which fixes the PG
# semantics: naive AT TIME ZONE z interprets the wall-clock in z and
# yields the UTC instant (to_utc_timestamp); applying AT TIME ZONE to
# a result that is already an instant (a chained second application)
# converts back to a wall-clock in the new zone (from_utc_timestamp) —
# the chain alternates exactly as PG's timestamp/timestamptz types do.
_AT_TIME_ZONE = re.compile(r"\bAT\s+TIME\s+ZONE\b", re.I)


def pg_at_time_zone(sql: str) -> str:
    start = 0
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                x
                for x in _AT_TIME_ZONE.finditer(sql, start)
                if not any(a <= x.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return sql
        j = m.end()
        while j < len(sql) and sql[j].isspace():
            j += 1
        sp = next((s for s in spans if s[0] == j), None)
        if sp is None:
            raise ValueError(
                "AT TIME ZONE requires a literal zone name here"
            )
        zone = sql[sp[0] : sp[1]]
        left = _left_operand(sql, spans, m.start())
        x = sql[left : m.start()].strip()
        # Direction: in this naive-timestamp engine an operand is an
        # "instant" (PG timestamptz) exactly when it derives from an
        # earlier to-UTC conversion — wrapping functions (parens,
        # date_trunc, greatest, ...) preserve that. A contains-scan
        # over the operand's unmasked code decides; an operand mixing
        # BOTH directions is genuinely ambiguous textually and rejects
        # loudly rather than guessing.
        xcode = "".join(t for k2, t in _segments(x) if k2 == "code")
        has_to = bool(re.search(r"\bto_utc_timestamp\s*\(", xcode, re.I))
        has_from = bool(
            re.search(r"\bfrom_utc_timestamp\s*\(", xcode, re.I)
        )
        if has_to and has_from:
            raise ValueError(
                "AT TIME ZONE: cannot infer the operand's zone state "
                "(it mixes to_utc_timestamp and from_utc_timestamp) — "
                "spell the conversion directly"
            )
        fn = "from_utc_timestamp" if has_to else "to_utc_timestamp"
        repl = f"{fn}({x}, {zone})"
        sql = sql[:left] + repl + sql[sp[1] :]
        # resume at the replacement start: a following chained
        # AT TIME ZONE sits after it, and the emitted text cannot
        # itself match the pattern
        start = left


# ---------------------------------------------------------------------------
# extract(epoch FROM x) — Spark's EXTRACT has no epoch field. PG
# returns seconds-since-epoch as numeric WITH the fractional part;
# Spark's cast timestamp → double is exactly that value (unlike
# unix_timestamp, which truncates). DATE operands cast through
# TIMESTAMP first (identity for timestamps).
_EXTRACT = re.compile(r"\bextract\s*\(", re.I)


def _top_level_minus(expr: str) -> int:
    """Index of the single top-level binary minus in `expr`, or -1
    (none, several, or a unary sign)."""
    hits: list[int] = []
    depth = 0
    pos = 0
    for kind, text in _segments(expr):
        if kind != "code":
            pos += len(text)
            continue
        for k, ch in enumerate(text):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "-" and depth == 0:
                prev = expr[: pos + k].rstrip()
                if prev and (prev[-1].isalnum() or prev[-1] in ")_'\""):
                    hits.append(pos + k)
        pos += len(text)
    return hits[0] if len(hits) == 1 else -1


def pg_extract_epoch(sql: str) -> str:
    start = 0
    while True:
        m, i, _ = _next_call(sql, _EXTRACT, start)
        if m is None:
            return sql
        em = re.match(r"\s*epoch\s+from\s+(.+)$", sql[m.end() : i],
                      re.I | re.S)
        if em is None:
            # some other field: Spark-native — but scan INSIDE its
            # argument, which may nest an epoch extract
            start = m.end()
            continue
        arg = em.group(1).strip()
        # PG's dominant duration idiom `extract(epoch FROM ts2 - ts1)`
        # yields an INTERVAL, which the cast-to-timestamp form cannot
        # express; epoch is additive, so split the subtraction —
        # unless an INTERVAL literal is involved (ts - INTERVAL '..'
        # is still a timestamp and the whole-operand form is right).
        minus = _top_level_minus(arg)
        if minus >= 0 and not re.search(
            r"\bINTERVAL\b",
            "".join(t for k2, t in _segments(arg) if k2 == "code"),
            re.I,
        ):
            a, b = arg[:minus].strip(), arg[minus + 1 :].strip()
            repl = (
                f"(CAST(CAST({a} AS TIMESTAMP) AS DOUBLE) - "
                f"CAST(CAST({b} AS TIMESTAMP) AS DOUBLE))"
            )
        else:
            repl = f"CAST(CAST({arg} AS TIMESTAMP) AS DOUBLE)"
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


# ---------------------------------------------------------------------------
# num_nonnulls / num_nulls — PG variadic null counters.
_NUM_NULLS = re.compile(r"\bnum_(non)?nulls\s*\(", re.I)


def pg_num_nulls(sql: str) -> str:
    start = 0
    while True:
        m, i, _ = _next_call(sql, _NUM_NULLS, start)
        if m is None:
            return sql
        args = [a.strip() for a in _split_top_level(sql[m.end() : i])]
        if not args or args == [""]:
            raise ValueError(f"{m.group(0)}...) requires arguments")
        test = "IS NOT NULL" if m.group(1) else "IS NULL"
        terms = " + ".join(
            f"(CASE WHEN {a} {test} THEN 1 ELSE 0 END)" for a in args
        )
        repl = f"({terms})"
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


def _find_call_span(sql: str, call_re, start: int = 0):
    """First unmasked match of `call_re` from `start` with its
    balanced argument span → (match, open_idx, close_idx), or None.
    Shared by the regex-function rewrites below (one masking + paren
    scan instead of a per-function copy)."""
    spans = _masked_spans(sql)
    target = None
    for m in call_re.finditer(sql, start):
        if any(a <= m.start() < b for a, b in spans):
            continue
        target = m
        break
    if target is None:
        return None
    open_idx = sql.index("(", target.end() - 1)
    depth = 0
    for i in _code_iter(sql, open_idx, spans):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return target, open_idx, i
    raise ValueError(f"unbalanced parentheses after {target.group(0)!r}")


def _respark_literal(raw: str) -> str:
    """Embed raw characters as a Spark string literal. Spark parses
    backslash escapes inside \'...\' (PG standard literals do not), so
    every backslash must double or the regex engine sees a mangled
    pattern — the r7 review's silent-wrong-data finding."""
    return "'" + raw.replace("\\", "\\\\").replace("'", "''") + "'"


def _pg_literal_chars(lit: str) -> str:
    """Characters of a PG standard string literal as written
    (\'...\'; doubled quotes are the only escape)."""
    return lit[1:-1].replace("''", "'")


_SUBSTR_CALL = re.compile(r"\bsubstring\s*\(", re.I)


def pg_substring_regex(sql: str) -> str:
    """PG's POSIX-regex substring — ``substring(string FROM 'pat')``
    (↔ the PG string function surface the reference inherits) →

        CASE WHEN (string) RLIKE 'pat'
             THEN regexp_extract(string, 'pat', G) END

    with G = 1 when the pattern has a capturing group (PG returns the
    first group then), else 0 (the whole match). The CASE gives PG's
    NULL on no match — regexp_extract alone returns \'\' there.
    Positional ``substring(x FROM n [FOR m])`` is Spark-native and
    passes through; the rewrite claims a call ONLY when the operand
    after FROM is a string literal. The pattern's characters reach
    the Java regex engine exactly as PG read them (backslashes are
    re-escaped for Spark's literal parser); a construct POSIX and
    Java disagree on fails loudly in Spark's regex compiler, never
    silently."""
    start = 0
    while True:
        found = _find_call_span(sql, _SUBSTR_CALL, start)
        if found is None:
            return sql
        target, open_idx, close_idx = found
        body = sql[open_idx + 1 : close_idx]
        bspans = _masked_spans(body)
        fm = None
        depth = 0
        for j in _code_iter(body, 0, bspans):
            c = body[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and body[j : j + 4].upper() == "FROM" and (
                j == 0 or body[j - 1].isspace()
            ) and (
                j + 4 < len(body) and body[j + 4].isspace()
            ):
                fm = j
                break
        pat = body[fm + 4 :].strip() if fm is not None else ""
        if fm is None or not re.fullmatch(r"'(?:[^']|'')*'", pat):
            # positional form or computed pattern: not ours. Resume
            # just past the call head so a regex-substring NESTED in
            # this call\'s operand still gets rewritten.
            start = target.start() + 1
            continue
        expr = body[:fm].strip()
        raw = _pg_literal_chars(pat)
        try:
            g = 1 if re.compile(raw).groups >= 1 else 0
        except re.error:
            g = 1 if re.search(r"(?<!\\)\((?!\?)", raw) else 0
        lit = _respark_literal(raw)
        repl = (
            f"(CASE WHEN ({expr}) RLIKE {lit} "
            f"THEN regexp_extract({expr}, {lit}, {g}) END)"
        )
        sql = sql[: target.start()] + repl + sql[close_idx + 1 :]
        # re-scan from the call site: `expr` was copied into the
        # replacement and may itself contain a regex substring
        start = target.start() + 1


_REGEXP_REPLACE = re.compile(r"\bregexp_replace\s*\(", re.I)


def _pg_replacement_to_java(raw: str) -> str:
    """PG regexp_replace replacement language → Java replaceAll:
    \\N → $N, \\& → $0, \\\\ → literal backslash, backslash-other →
    that character, literal $ escaped. Output is the JAVA-level
    string (embed with _respark_literal)."""
    out = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            n = raw[i + 1]
            if n.isdigit():
                out.append(f"${n}")
            elif n == "&":
                out.append("$0")
            elif n == "\\":
                out.append("\\\\")  # Java literal backslash
            elif n in "$":
                out.append("\\$")
            else:
                out.append(n)
            i += 2
            continue
        if c == "$":
            out.append("\\$")  # Java: literal dollar
        elif c == "\\":
            out.append("\\\\")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _shift_java_group_refs(java: str, by: int) -> str:
    """Renumber $N group references in a Java replacement string
    (output of _pg_replacement_to_java — refs are single-digit $N or
    $0; \\$ is an escaped literal dollar). Shifted refs may go
    two-digit ($9 → $11): safe, because PG already validated that the
    pattern HAS group N, so after wrapping group N+by exists and
    Java's greedy longest-valid-group parse resolves it correctly."""
    out = []
    i = 0
    while i < len(java):
        if java[i] == "\\" and i + 1 < len(java):
            out.append(java[i : i + 2])  # escaped char (incl. \$)
            i += 2
            continue
        if java[i] == "$" and i + 1 < len(java) and java[i + 1].isdigit():
            out.append(f"${int(java[i + 1]) + by}")
            i += 2
            continue
        out.append(java[i])
        i += 1
    return "".join(out)


def _shift_pattern_backrefs(raw: str, by: int) -> str:
    """Renumber \\N backrefs INSIDE a regex pattern by `by` (escaped
    backslashes tracked, so \\\\1 stays a literal-backslash + '1')."""
    out = []
    i = 0
    while i < len(raw):
        if raw[i] == "\\" and i + 1 < len(raw):
            n = raw[i + 1]
            if n.isdigit() and n != "0":
                out.append(f"\\{int(n) + by}")
            else:
                out.append(raw[i : i + 2])
            i += 2
            continue
        out.append(raw[i])
        i += 1
    return "".join(out)


def pg_regexp_replace_flags(sql: str) -> str:
    """PG's 4-argument ``regexp_replace(src, pat, repl, flags)`` →
    Spark's 3-argument form, for flags drawn from {g, i} (plus ''):

    - 'g'  — global replace: Spark's regexp_replace is always-global,
      so this is a direct translation.
    - 'gi'/'ig' — global case-insensitive: ``(?i)`` pattern prefix.
    - 'i' / '' — PG replaces only the FIRST match. Emulated with a
      lazy-prefix wrap: pattern ``(\\A(?s:.*?))((?i)pat)`` and
      replacement ``$1`` + the translated replacement with group
      refs shifted by 2 (prefix group = 1, whole-pat wrapper = 2 —
      which is also what $0/\\& now means). ``\\A`` anchors only at
      string start, so a global engine can fire at most once.

    The pattern literal is re-escaped for Spark's literal parser; the
    replacement literal is translated from PG's replacement language
    (\\N backrefs, \\& whole-match, \\\\ literal backslash) to
    Java's ($N, $0, escaped $). Spark's own signatures (3 args, or an
    integer position) pass through untouched. Other flag characters
    (m/n/p/s/w/q/x…) and non-literal patterns/replacements (whose
    backrefs cannot be translated statically) are rejected loudly
    rather than silently changing semantics.
    Reference behavior: PG regexp_replace flag semantics as exercised
    by shard-local SQL in the reference's regress suites."""
    start = 0
    while True:
        found = _find_call_span(sql, _REGEXP_REPLACE, start)
        if found is None:
            return sql
        target, open_idx, close_idx = found
        body = sql[open_idx + 1 : close_idx]
        args = _split_top_level(body)
        if len(args) != 4 or not re.fullmatch(
            r"'(?:[^']|'')*'", args[3].strip()
        ):
            start = target.start() + 1
            continue  # Spark-native signature: not ours
        flags = _pg_literal_chars(args[3].strip())
        if not set(flags) <= {"g", "i"}:
            raise ValueError(
                f"regexp_replace flags {flags!r} are not supported — "
                "only 'g', 'i', 'gi' and '' translate"
            )
        ci = "i" in flags
        repl = args[2].strip()
        if not re.fullmatch(r"'(?:[^']|'')*'", repl):
            raise ValueError(
                "regexp_replace with a flags argument needs a LITERAL "
                "replacement — a computed replacement's PG backrefs "
                "(\\N) cannot be translated to Java's ($N) statically"
            )
        java = _pg_replacement_to_java(_pg_literal_chars(repl))
        if "g" in flags and not ci:
            # plain 'g' is exactly Spark's 3-arg semantics — no
            # pattern rewriting. A LITERAL pattern still re-escapes
            # for Spark's backslash-eating literal parser; a computed
            # pattern passes through untouched (its runtime value
            # never goes through that parser).
            p = args[1].strip()
            if re.fullmatch(r"'(?:[^']|'')*'", p):
                p = _respark_literal(_pg_literal_chars(p))
            sql = (
                sql[: target.start()]
                + f"regexp_replace({args[0]}, {p}, "
                + f"{_respark_literal(java)})"
                + sql[close_idx + 1 :]
            )
            start = target.start() + 1
            continue
        pat = args[1].strip()
        if not re.fullmatch(r"'(?:[^']|'')*'", pat):
            raise ValueError(
                "regexp_replace with 'i' or first-match flags needs a "
                "LITERAL pattern — the translation rewrites the "
                "pattern text"
            )
        raw_pat = _pg_literal_chars(pat)
        if "g" in flags:
            jpat = ("(?i)" if ci else "") + raw_pat
            jrepl = java
        else:
            # first-match-only wrap (see docstring)
            jpat = (
                r"(\A(?s:.*?))("
                + ("(?i)" if ci else "")
                + _shift_pattern_backrefs(raw_pat, 2)
                + ")"
            )
            jrepl = "$1" + _shift_java_group_refs(java, 2)
        new_call = (
            f"regexp_replace({args[0]}, "
            f"{_respark_literal(jpat)}, {_respark_literal(jrepl)})"
        )
        sql = sql[: target.start()] + new_call + sql[close_idx + 1 :]
        start = target.start() + 1


# ---------------------------------------------------------------------------
# PG `^` is exponentiation; Spark's `^` is bitwise XOR — the same
# spelling with silently different answers (2 ^ 10 = 1024 vs 8), the
# worst kind of port bug. Under pg_compat the PG meaning wins (PG
# spells XOR `#`). Left-associative like PG: each loop iteration
# folds the LEFTMOST `^`, and the completed power(..) call matches
# the call-operand shape on the next iteration, so `a ^ b ^ c`
# becomes power(power(a, b), c). PG precedence quirk handled by a
# backward scan: unary minus binds TIGHTER than ^ (-a ^ 2 is
# power(-a, 2) = a², verified against DuckDB/PG), while binary minus
# binds looser (b - a ^ 2 stays b - power(a, 2)).
# The call-shaped alternative must not swallow `KEYWORD (expr)` —
# `SELECT (1+1) ^ 2` is a paren operand after a keyword, not a call.
_CARET_KW_NAMES = (
    r"SELECT|WHERE|AND|OR|NOT|THEN|ELSE|WHEN|CASE|END|FROM|ON"
    r"|IN|BETWEEN|LIKE|ILIKE|IS|BY|AS|JOIN|HAVING|GROUP|ORDER|UNION"
    r"|ALL|ANY|SOME|DISTINCT|SET|VALUES|RETURNING|EXISTS|INTERVAL"
    r"|OVER|FILTER|LIMIT|OFFSET|USING|CROSS|INNER|LEFT|RIGHT|FULL"
    r"|RETURN|IF|ELSIF"
)
_CARET_KW = rf"(?!(?i:{_CARET_KW_NAMES})\s*\()"
# a bare-identifier operand must not be a keyword either — `.. END ^
# 2` would otherwise fold as power(END, 2) instead of hitting the
# loud leftover check
_CARET_KW_IDENT = rf"(?!(?i:{_CARET_KW_NAMES})\b)"
# parenthesized bodies admit two nesting levels — enough for the
# folded power(a, f(b)) forms the left-assoc loop creates; deeper
# residue hits the loud leftover check below instead of silent XOR
_CARET_PAREN_BODY = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"
_CARET_OPERAND = (
    rf"(?:(?<![\w.]){_CARET_KW}[A-Za-z_][\w.]*\s*\({_CARET_PAREN_BODY}\)"
    rf"|(?<![\w.]){_CARET_KW_IDENT}[A-Za-z_][\w.]*"
    rf"|(?<![\w.])[0-9]+(?:\.[0-9]+)?|\({_CARET_PAREN_BODY}\))"
)
_CARET = re.compile(
    rf"(?P<l>{_CARET_OPERAND})\s*\^\s*(?P<r>-?\s*{_CARET_OPERAND})"
)
_OPERAND_END = set(")]'\"")
# keywords that put a following minus in UNARY position (an
# identifier or literal there would make it binary subtraction)
_UNARY_PRECEDERS = {
    "SELECT", "WHERE", "AND", "OR", "NOT", "THEN", "ELSE", "WHEN",
    "CASE", "RETURN", "RETURNING", "BY", "ON", "IN", "SET", "VALUES",
    "HAVING", "LIMIT", "OFFSET", "ALL", "DISTINCT", "AS", "IS",
    "BETWEEN", "LIKE", "ILIKE", "UNION", "INTERSECT", "EXCEPT",
    "COALESCE", "IF", "ELSIF", "DEFAULT", "CHECK",
}


def pg_power_caret(sql: str) -> str:
    """Rewrite binary `a ^ b` to power(a, b) (PG semantics)."""
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                c
                for c in _CARET.finditer(sql)
                if not any(a <= c.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            leftover = next(
                (
                    i
                    for i, ch in enumerate(sql)
                    if ch == "^"
                    and not any(a <= i < b for a, b in spans)
                ),
                None,
            )
            if leftover is not None:
                raise NotImplementedError(
                    "cannot translate this `^` operand shape to "
                    f"power() — near: {sql[max(0, leftover - 30):leftover + 30]!r}"
                )
            return sql
        left, start = m.group("l"), m.start()
        # absorb a UNARY minus into the left operand (PG: unary minus
        # binds tighter than ^; a minus preceded by an operand ending
        # is binary and stays outside)
        i = start - 1
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i >= 0 and sql[i] == "-":
            j = i - 1
            while j >= 0 and sql[j].isspace():
                j -= 1
            if j < 0:
                unary = True
            elif sql[j].isalpha() or sql[j] == "_":
                # a word before the minus: keyword → unary position
                # (SELECT -a ^ 2); identifier → binary (b - a ^ 2)
                k = j
                while k >= 0 and (sql[k].isalnum() or sql[k] == "_"):
                    k -= 1
                unary = sql[k + 1 : j + 1].upper() in _UNARY_PRECEDERS
            else:
                # after digits/')'/']'/quotes the minus is binary;
                # after '(' ',' or another operator it is unary
                unary = not (
                    sql[j].isdigit() or sql[j] in _OPERAND_END
                )
            if unary:
                left, start = f"-{left}", i
        sql = (
            f"{sql[:start]}power({left}, {m.group('r')})"
            f"{sql[m.end():]}"
        )


# ---------------------------------------------------------------------------
# SQL-standard (S1, E1) OVERLAPS (S2, E2) — Spark has no such
# operator. PG semantics: endpoints normalize (least/greatest), two
# intervals overlap when they share a point with at least one
# half-open side — equivalently: equal starts always overlap (even
# zero-length), otherwise the later start must fall strictly inside
# the earlier interval. Operand expressions substitute textually (a
# volatile operand would evaluate more than once; none of the
# supported deterministic expressions care).
def _masked_close_paren(sql: str, start: int, spans, depth: int = 1) -> int:
    """Index of the ')' that closes the group already `depth` levels
    deep at `start`, skipping masked spans; -1 when unbalanced. The
    shared scan for every rewrite that slices a parenthesized group
    out of raw statement text."""
    e = start
    while e < len(sql):
        if not any(a <= e < b for a, b in spans):
            if sql[e] == "(":
                depth += 1
            elif sql[e] == ")":
                depth -= 1
                if depth == 0:
                    return e
        e += 1
    return -1


_OVERLAPS_KW = re.compile(r"\bOVERLAPS\b", re.I)


def pg_overlaps(sql: str) -> str:
    # Known divergence: with a NULL endpoint, Spark's least/greatest
    # skip NULLs, so (d, NULL) collapses to the instant d and the
    # expansion yields FALSE where PG yields NULL when the overlap is
    # undeterminable. Filtering semantics are identical (WHERE treats
    # NULL and FALSE the same); only NULL-vs-FALSE projection fidelity
    # differs. Acceptable per review — gate endpoints on non-null if a
    # projected OVERLAPS ever needs PG's ternary result.
    while True:
        spans = _masked_spans(sql)

        def masked(p: int) -> bool:
            return any(a <= p < b for a, b in spans)

        m = next(
            (c for c in _OVERLAPS_KW.finditer(sql) if not masked(c.start())),
            None,
        )
        if m is None:
            return sql
        i = m.start() - 1
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i < 0 or sql[i] != ")":
            raise ValueError(
                "OVERLAPS needs parenthesized (start, end) row values "
                "on both sides"
            )
        depth, j = 0, i
        while j >= 0:
            if not masked(j):
                if sql[j] == ")":
                    depth += 1
                elif sql[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
            j -= 1
        k = m.end()
        while k < len(sql) and sql[k].isspace():
            k += 1
        if j < 0 or k >= len(sql) or sql[k] != "(":
            raise ValueError(
                "OVERLAPS needs parenthesized (start, end) row values "
                "on both sides"
            )
        e = _masked_close_paren(sql, k + 1, spans)
        if e < 0:
            raise ValueError("OVERLAPS: unbalanced parentheses")
        la = _split_top_level(sql[j + 1 : i])
        ra = _split_top_level(sql[k + 1 : e])
        if len(la) != 2 or len(ra) != 2:
            raise ValueError(
                "OVERLAPS takes exactly two values per side: "
                "(start, end) OVERLAPS (start, end)"
            )
        l1 = f"least({la[0].strip()}, {la[1].strip()})"
        g1 = f"greatest({la[0].strip()}, {la[1].strip()})"
        l2 = f"least({ra[0].strip()}, {ra[1].strip()})"
        g2 = f"greatest({ra[0].strip()}, {ra[1].strip()})"
        expr = (
            f"(({l1} = {l2}) OR ({l1} < {l2} AND {l2} < {g1})"
            f" OR ({l2} < {l1} AND {l1} < {g2}))"
        )
        sql = sql[:j] + expr + sql[e + 1 :]


# ---------------------------------------------------------------------------
# PG UPDATE row-form assignment: SET (a, b) = (e1, e2) — the
# multi-column spelling every hand-written migration uses. Expands
# textually to the pairwise form the UPDATE parser already handles;
# the sub-SELECT row form rejects loudly (its single evaluation
# semantics cannot be faked by pairwise scalar subqueries when the
# subquery is volatile or expensive).
_ROW_SET = re.compile(
    r"\(\s*(?P<cols>[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)+)\s*\)\s*=\s*\(",
)


def _set_list_bounds(sql: str) -> tuple[int, int]:
    """[start, end) of the UPDATE statement's SET list: after the
    first depth-0 SET, up to the first depth-0 FROM/WHERE/RETURNING —
    a row-VALUE comparison `(a, b) = (1, 2)` in the WHERE clause must
    stay untouched."""
    spans = _masked_spans(sql)
    depth = 0
    start = end = -1
    for m in re.finditer(r"[()]|\b(SET|FROM|WHERE|RETURNING)\b", sql, re.I):
        if any(a <= m.start() < b for a, b in spans):
            continue
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if tok.upper() == "SET" and start < 0:
                start = m.end()
            elif start >= 0:
                end = m.start()
                break
    if start < 0:
        return 0, 0
    return start, end if end >= 0 else len(sql)


def _assignment_item_starts(
    sql: str, lo: int, hi: int, spans: list[tuple[int, int]]
) -> set[int]:
    """Positions where a SET-list assignment item begins: right after
    SET itself and after each depth-0 comma (whitespace skipped). A
    row-form `(a, b) = (..)` is only an assignment when it starts an
    item — the same shape nested inside a SET expression (e.g. a
    row-VALUE comparison in a CASE) must stay untouched."""
    bounds: list[int] = [lo]
    depth = 0
    i = lo
    while i < hi:
        if any(a <= i < b for a, b in spans):
            i += 1
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            bounds.append(i + 1)
        i += 1
    out = set()
    for b in bounds:
        while b < hi and sql[b].isspace():
            b += 1
        out.add(b)
    return out


def pg_update_row_set(sql: str) -> str:
    while True:
        lo, hi = _set_list_bounds(sql)
        spans = _masked_spans(sql)
        starts = _assignment_item_starts(sql, lo, hi, spans)
        m = next(
            (
                c
                for c in _ROW_SET.finditer(sql, lo, hi)
                if c.start() in starts
                and not any(a <= c.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return sql
        e = _masked_close_paren(sql, m.end(), spans)
        if e < 0:
            raise ValueError("SET (..) = (..): unbalanced parentheses")
        rhs = sql[m.end() : e]
        if re.match(r"\s*SELECT\b", rhs, re.I):
            raise NotImplementedError(
                "UPDATE SET (a, b) = (SELECT ..) is not supported — "
                "spell the assignments with scalar subqueries per "
                "column, or stage the subquery with UPDATE .. FROM"
            )
        cols = [c.strip() for c in m.group("cols").split(",")]
        exprs = [x.strip() for x in _split_top_level(rhs)]
        if len(cols) != len(exprs):
            raise ValueError(
                f"SET row form: {len(cols)} columns but "
                f"{len(exprs)} expressions"
            )
        pairwise = ", ".join(
            f"{c} = {x}" for c, x in zip(cols, exprs)
        )
        sql = sql[: m.start()] + pairwise + sql[e + 1 :]


# ---------------------------------------------------------------------------
# PG row-value comparison: (a, b) = (c, d) / (a, b) <> (c, d).
# Spark compiles both sides to named_struct and then refuses the
# comparison because the FIELD NAMES differ (col names vs col1/col2)
# — a loud error on a spelling PG migrations use freely. PG defines
# row = as pairwise AND and row <> as pairwise OR, and three-valued
# logic matches exactly ((true AND NULL) = NULL, (false AND NULL) =
# false — same rows PG returns), so the textual expansion is
# semantics-preserving. Ordering comparisons (< >) stay untouched:
# their lexicographic semantics are not a simple AND/OR.
# LHS items are paren-free expressions (columns, literals, simple
# arithmetic — no calls: a call's own argument list would be
# indistinguishable textually). A comma inside a string literal can
# miscount items; the mismatch path leaves the text to Spark rather
# than erroring, so that corner keeps its native behavior.
_ROW_CMP = re.compile(
    r"(?<![\w.)\]])\(\s*(?P<cols>[^(),]+"
    r"(?:\s*,\s*[^(),]+)+)\s*\)\s*(?P<op>=|<>|!=)\s*\(",
)


def pg_row_comparison(sql: str) -> str:
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                c
                for c in _ROW_CMP.finditer(sql)
                if not any(a <= c.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return sql
        e = _masked_close_paren(sql, m.end(), spans)
        if e < 0:
            return sql  # unbalanced tail — leave for the parser
        rhs = sql[m.end() : e]
        if re.match(r"\s*(SELECT|WITH|VALUES)\b", rhs, re.I):
            return sql  # row-subquery compare: not this rewrite's job
        cols = [c.strip() for c in m.group("cols").split(",")]
        exprs = [x.strip() for x in _split_top_level(rhs)]
        if len(cols) != len(exprs):
            return sql  # miscounted (literal commas?) — leave native
        if m.group("op") == "=":
            body = " AND ".join(
                f"({c}) = ({x})" for c, x in zip(cols, exprs)
            )
        else:
            body = " OR ".join(
                f"({c}) <> ({x})" for c, x in zip(cols, exprs)
            )
        sql = f"{sql[: m.start()]}({body}){sql[e + 1 :]}"


# --- PG LIMIT/OFFSET forms Spark's parser rejects ---------------------
# PG: LIMIT NULL = no limit, OFFSET NULL = no offset, and the clauses
# may appear in either order (regress multi_limit_clause.sql:226-242).
# Spark accepts LIMIT ALL but not the NULL spellings, and requires
# LIMIT before OFFSET. None of the rewritten spellings are valid
# Spark, so the rewrite is unconditional-safe (literal spans masked).
_LIMIT_NULL = re.compile(r"\bLIMIT\s+NULL\b", re.IGNORECASE)
_OFFSET_NULL = re.compile(r"\bOFFSET\s+NULL\b", re.IGNORECASE)
_OFFSET_BEFORE_LIMIT = re.compile(
    r"\bOFFSET\s+(?P<off>\d+|NULL)\s+LIMIT\s+(?P<lim>\d+|ALL|NULL)\b",
    re.IGNORECASE,
)


def pg_limit_forms(sql: str) -> str:
    def sub(rx, repl, text):
        # spans recomputed per pass: the previous pass changed text
        # lengths, so cached offsets would misclassify later matches
        # (rewriting literal contents / skipping real code — review
        # fix)
        spans = _masked_spans(text)
        out, pos = [], 0
        for m in rx.finditer(text):
            if any(a <= m.start() < b for a, b in spans):
                continue
            out.append(text[pos:m.start()])
            out.append(repl(m))
            pos = m.end()
        out.append(text[pos:])
        return "".join(out)

    sql = sub(
        _OFFSET_BEFORE_LIMIT,
        lambda m: f"LIMIT {m.group('lim')} OFFSET {m.group('off')}",
        sql,
    )
    sql = sub(_LIMIT_NULL, lambda m: "LIMIT ALL", sql)
    sql = sub(_OFFSET_NULL, lambda m: "OFFSET 0", sql)
    return sql
