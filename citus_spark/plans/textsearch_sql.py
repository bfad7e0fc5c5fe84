"""PostgreSQL full-text search surface — to_tsvector / to_tsquery /
plainto_tsquery / @@ / ts_rank.

↔ reference src/test/regress/sql/text_search.sql (Citus propagates
TEXT SEARCH CONFIGURATION objects and pushes @@ predicates to
workers). This engine implements the semantics of PG's **'simple'**
configuration — lowercase, split on non-alphanumerics, no stemming,
no stop words — because those semantics are exactly reproducible by
an independent engine (the DuckDB oracles re-derive them from string
primitives, value-exact). A config argument like 'english' is
ACCEPTED and IGNORED with simple semantics (stemming dictionaries are
out of scope; documented divergence).

Execution is pure JVM: the ts_* helpers are Spark SQL UDFs
(CREATE TEMPORARY FUNCTION ... RETURN <expr>), so tokenization and
matching stay inside whole-stage codegen — no Python in the hot path.

ts_rank here is the SIMPLIFIED frequency rank
    sum(occurrences of each query term) / number of document tokens
not PG's cover-density weighting — deterministic, monotone in term
frequency, and re-derivable cross-engine (documented divergence).
"""

from __future__ import annotations

import re

from citus_spark.plans.rewrites import _masked_spans

_TS_FUNCS = [
    # tokenizer: PG 'simple' config semantics
    "CREATE OR REPLACE TEMPORARY FUNCTION to_tsvector(txt STRING) "
    "RETURNS ARRAY<STRING> "
    "RETURN filter(split(lower(txt), '[^a-z0-9]+'), x -> x != '')",
    "CREATE OR REPLACE TEMPORARY FUNCTION ts_match_all("
    "v ARRAY<STRING>, q ARRAY<STRING>) RETURNS BOOLEAN "
    "RETURN forall(q, t -> array_contains(v, t))",
    "CREATE OR REPLACE TEMPORARY FUNCTION ts_match_any("
    "v ARRAY<STRING>, q ARRAY<STRING>) RETURNS BOOLEAN "
    "RETURN arrays_overlap(v, q)",
    # simplified frequency rank (see module docstring)
    "CREATE OR REPLACE TEMPORARY FUNCTION ts_rank_simple("
    "v ARRAY<STRING>, q ARRAY<STRING>) RETURNS DOUBLE "
    "RETURN CAST(aggregate(q, 0, (acc, t) -> "
    "acc + size(filter(v, x -> x = t))) AS DOUBLE) "
    "/ CAST(greatest(size(v), 1) AS DOUBLE)",
    # prefix operator term:* — any token starting with the lexeme
    "CREATE OR REPLACE TEMPORARY FUNCTION ts_match_prefix("
    "v ARRAY<STRING>, p STRING) RETURNS BOOLEAN "
    "RETURN exists(v, x -> startswith(x, p))",
    # phrase operator a <-> b / a <N> b: q holds the lexemes, offs the
    # cumulative position offsets (a <-> b → offs [0,1]; a <2> b →
    # [0,2]), pfx marks prefix lexemes. The tsvector keeps tokens in
    # document order, so positions ARE array indices; CASE guards the
    # empty/short vector (sequence() would run descending otherwise)
    "CREATE OR REPLACE TEMPORARY FUNCTION ts_match_phrase("
    "v ARRAY<STRING>, q ARRAY<STRING>, offs ARRAY<INT>, "
    "pfx ARRAY<BOOLEAN>) RETURNS BOOLEAN "
    "RETURN CASE WHEN size(v) > element_at(offs, -1) THEN "
    "exists(sequence(0, size(v) - 1 - element_at(offs, -1)), "
    "i -> forall(sequence(1, size(q)), "
    "j -> IF(pfx[j-1], startswith(v[i + offs[j-1]], q[j-1]), "
    "v[i + offs[j-1]] = q[j-1]))) ELSE false END",
]


def register_ts_functions(spark) -> None:
    for ddl in _TS_FUNCS:
        spark.sql(ddl)


# -- tsquery literal parser (simple-config lexing: terms lowercase) --
# PG precedence, tightest first: ! , <-> (phrase), & , |
def _parse_tsquery(body: str):
    """'a & (b | !c)' → ('and', [('term','a'), ('or', [...])]).
    Phrase: 'a <-> b' / 'a <2> b' → ('phrase', [(node, off), ...])
    with cumulative position offsets; prefix: 'a:*' → ('prefix','a')."""
    if re.search(r"[<>]", re.sub(r"<->|<\d+>", "", body)):
        # a stray '<' or '>' (e.g. the typo 'a <') must be a syntax
        # error, not a silently-dropped token matching everything
        raise ValueError(f"tsquery {body!r}: syntax error near '<'/'>'")
    toks = re.findall(r"<->|<\d+>|[()&|!]|[^\s()&|!<>]+", body)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"tsquery {body!r}: unbalanced or truncated")
        t = toks[pos]
        pos += 1
        return t

    def expr():
        left = and_expr()
        parts = [left]
        while peek() == "|":
            take()
            parts.append(and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def and_expr():
        left = phrase_expr()
        parts = [left]
        while peek() == "&":
            take()
            parts.append(phrase_expr())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def phrase_expr():
        left = unary()
        chain = [(left, 0)]
        while peek() is not None and peek().startswith("<"):
            op = take()
            dist = 1 if op == "<->" else int(op[1:-1])
            chain.append((unary(), chain[-1][1] + dist))
        if len(chain) == 1:
            return left
        for node, _off in chain:
            if node[0] not in ("term", "prefix"):
                raise ValueError(
                    f"tsquery {body!r}: phrase members must be lexemes "
                    "or prefix lexemes (nested boolean sub-phrases are "
                    "not supported)"
                )
        return ("phrase", chain)

    def unary():
        t = peek()
        if t == "!":
            take()
            return ("not", unary())
        if t == "(":
            take()
            e = expr()
            if take() != ")":
                raise ValueError(f"tsquery {body!r}: unbalanced parens")
            return e
        if t is None or t in "&|)" or t.startswith("<"):
            raise ValueError(f"tsquery {body!r}: unexpected token {t!r}")
        take()
        if t.endswith(":*"):
            return ("prefix", t[:-2].lower())
        if ":" in t:
            raise ValueError(
                f"tsquery {body!r}: weight labels (:A..:D) are not "
                "supported (simple config has no weights)"
            )
        return ("term", t.lower())

    tree = expr()
    if pos != len(toks):
        raise ValueError(f"tsquery {body!r}: trailing tokens")
    return tree


def _terms_if_flat(tree, op):
    """['a','b'] when tree is `op` over plain terms (or one term)."""
    if tree[0] == "term":
        return [tree[1]]
    if tree[0] == op and all(c[0] == "term" for c in tree[1]):
        return [c[1] for c in tree[1]]
    return None


def _sql_array(terms) -> str:
    return "array(" + ", ".join(f"'{t}'" for t in terms) + ")"


def emit_match(vec_sql: str, tree) -> str:
    """Boolean Spark SQL for `vec @@ tree`. Flat AND/OR use the
    set-helpers (one to_tsvector evaluation); mixed trees expand to
    array_contains per term."""
    flat = _terms_if_flat(tree, "and")
    if flat is not None:
        return f"ts_match_all({vec_sql}, {_sql_array(flat)})"
    flat = _terms_if_flat(tree, "or")
    if flat is not None:
        return f"ts_match_any({vec_sql}, {_sql_array(flat)})"

    def rec(t) -> str:
        if t[0] == "term":
            return f"array_contains({vec_sql}, '{t[1]}')"
        if t[0] == "prefix":
            return f"ts_match_prefix({vec_sql}, '{t[1]}')"
        if t[0] == "phrase":
            lexemes = ", ".join(f"'{n[1]}'" for n, _o in t[1])
            offs = ", ".join(str(o) for _n, o in t[1])
            pfx = ", ".join(
                "true" if n[0] == "prefix" else "false" for n, _o in t[1]
            )
            return (
                f"ts_match_phrase({vec_sql}, array({lexemes}), "
                f"array({offs}), array({pfx}))"
            )
        if t[0] == "not":
            return f"(NOT {rec(t[1])})"
        joiner = " AND " if t[0] == "and" else " OR "
        return "(" + joiner.join(rec(c) for c in t[1]) + ")"

    return rec(tree)


# -- textual rewrite ---------------------------------------------------
# config argument: to_tsvector('english', x) → to_tsvector(x); the
# config name is the literal FIRST argument of the ts functions
_CFG_ARG = re.compile(
    r"\b(to_tsvector|to_tsquery|plainto_tsquery|websearch_to_tsquery)"
    r"\s*\(\s*'[A-Za-z_]+'\s*,\s*",
    re.I,
)
# rhs of @@ : a tsquery constructor with a literal argument, or
# 'lit'::tsquery
_TSQUERY_RHS = re.compile(
    r"@@\s*(?:(?P<fn>to_tsquery|plainto_tsquery|websearch_to_tsquery)"
    r"\s*\(\s*'(?P<q>[^']*)'\s*\)|'(?P<cast>[^']*)'\s*::\s*tsquery)",
    re.I,
)
_TS_RANK = re.compile(r"\bts_rank\s*\(", re.I)


def _expr_start_before(sql: str, end: int, spans) -> int:
    """Start index of the expression ending just before `end`
    (backward balanced scan; literal spans skip wholesale)."""
    i = end - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        raise ValueError("@@ without a left operand")

    def span_at(p):
        for a, b in spans:
            if a <= p < b:
                return a, b
        return None

    if sql[i] == ")":
        depth = 0
        while i >= 0:
            sp = span_at(i)
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
        if i < 0:
            raise ValueError("unbalanced parens before @@")
        i -= 1
    # identifier path (callee name or plain column)
    while i >= 0 and (sql[i].isalnum() or sql[i] in "._"):
        i -= 1
    return i + 1


def pg_text_search(sql: str) -> str:
    """Rewrite the @@ / ts_rank / config-argument spellings."""
    # 1. drop config arguments (segment-protected not needed: the
    # pattern itself requires the quoted config then a comma)
    sql = _CFG_ARG.sub(lambda m: f"{m.group(1)}(", sql)

    # 2. `expr @@ tsquery-constructor('lit')`
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                x
                for x in _TSQUERY_RHS.finditer(sql)
                if not any(a <= x.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            break
        qlit = m.group("q") if m.group("q") is not None else m.group("cast")
        fn = (m.group("fn") or "to_tsquery").lower()
        if fn in ("plainto_tsquery", "websearch_to_tsquery"):
            terms = [
                t.lower()
                for t in re.findall(r"[^\s()&|!']+", qlit)
                if t not in "&|!"
            ]
            tree = (
                ("and", [("term", t) for t in terms])
                if len(terms) > 1
                else ("term", terms[0] if terms else "")
            )
        else:
            tree = _parse_tsquery(qlit)
        lhs_start = _expr_start_before(sql, m.start(), spans)
        vec_sql = sql[lhs_start : m.start()].strip()
        sql = (
            sql[:lhs_start]
            + emit_match(vec_sql, tree)
            + sql[m.end() :]
        )

    # 3. ts_rank(vec_expr, tsquery-constructor('lit')) — flat AND/OR
    # terms only (the frequency rank sums per-term occurrences)
    while True:
        spans = _masked_spans(sql)
        m = next(
            (
                x
                for x in _TS_RANK.finditer(sql)
                if not any(a <= x.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            break
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
            raise ValueError("unbalanced parens in ts_rank")
        inner = sql[m.end() : i]
        from citus_spark.plans.rewrites import _split_top_level

        args = _split_top_level(inner)
        if len(args) != 2:
            raise ValueError("ts_rank expects (tsvector_expr, tsquery)")
        qm = re.match(
            r"(?:to_tsquery|plainto_tsquery|websearch_to_tsquery)"
            r"\s*\(\s*'([^']*)'\s*\)\s*$|'([^']*)'\s*::\s*tsquery\s*$",
            args[1],
            re.I,
        )
        if qm is None:
            raise ValueError(
                "ts_rank: second argument must be a tsquery constructor "
                "with a literal query"
            )
        qlit = qm.group(1) if qm.group(1) is not None else qm.group(2)
        tree = _parse_tsquery(qlit)
        terms = _terms_if_flat(tree, "and") or _terms_if_flat(tree, "or")
        if terms is None:
            raise ValueError(
                "ts_rank supports flat AND/OR term lists only"
            )
        sql = (
            sql[: m.start()]
            + f"ts_rank_simple({args[0]}, {_sql_array(terms)})"
            + sql[i + 1 :]
        )
    return sql
