"""Minimal plpgsql-to-SQL translation — the tutorial-function subset
(↔ reference src/backend/distributed/sql/udfs/ and the plpgsql
helpers its regress suites define; PG docs ch. 43 examples).

Scope (everything else rejects loudly at the first unparsed
statement): DECLARE with initializers, `var := expr` assignment,
`SELECT expr INTO var [FROM ..]`, IF/ELSIF/ELSE where every branch is
a single RETURN, a final RETURN expr, and RETURN QUERY over a single
SELECT. The translation is SYMBOLIC — variables substitute as
parenthesized expressions in declaration order, so the resulting body
is one SQL expression (or one SELECT) that Spark's SQL-UDF machinery
(plans/function_sql.py) registers exactly like a LANGUAGE sql
function: it ships with the plan and runs in whole-stage codegen,
which is the Spark-first answer to PG's per-row interpreter.

Consequence of symbolic substitution: a variable used twice
re-evaluates its defining expression twice. PG evaluates once. For
the deterministic expressions this subset accepts the results are
identical; volatile calls (nextval, random) are rejected to keep that
equivalence honest."""

from __future__ import annotations

import re

from citus_spark.plans.ddl_sql import _map_type

_VOLATILE = re.compile(r"\b(nextval|random|setval|currval)\s*\(", re.I)


def _mask_spans(text: str) -> list[tuple[int, int]]:
    from citus_spark.plans.rewrites import _masked_spans

    return _masked_spans(text)


def _strip_comments(text: str) -> str:
    """Remove -- comments outside string literals (_masked_spans
    already delimits them as masked spans starting with '--')."""
    spans = [
        (a, b) for a, b in _mask_spans(text) if text[a : a + 2] == "--"
    ]
    for a, b in reversed(spans):
        text = text[:a] + text[b:]
    return text


def _subst(text: str, env: dict[str, str]) -> str:
    """Replace declared-variable references with their (parenthesized)
    defining expressions — longest names first, code positions only."""
    for name in sorted(env, key=len, reverse=True):
        pat = re.compile(rf"\b{re.escape(name)}\b", re.I)

        def repl(m: re.Match, _n=name) -> str:
            spans = _mask_spans(text)
            if any(a <= m.start() < b for a, b in spans):
                return m.group(0)
            return f"({env[_n]})"

        text = pat.sub(repl, text)
    return text


def _check_volatile(expr: str, what: str) -> None:
    if _VOLATILE.search(expr):
        raise NotImplementedError(
            f"plpgsql: volatile call in {what} is not supported — "
            "symbolic substitution would change how often it runs"
        )


_STMT_IF = re.compile(r"^\s*IF\s+", re.I)
_STMT_RETURN_QUERY = re.compile(
    r"^\s*RETURN\s+QUERY\s+(?P<q>(?:SELECT|WITH|VALUES)\b.*?);\s*(?P<rest>.*)$",
    re.I | re.S,
)
_STMT_RETURN = re.compile(
    r"^\s*RETURN\s+(?P<e>.+?);\s*(?P<rest>.*)$", re.I | re.S
)
_STMT_ASSIGN = re.compile(
    r"^\s*(?P<v>[A-Za-z_]\w*)\s*:=\s*(?P<e>.+?);\s*(?P<rest>.*)$",
    re.I | re.S,
)
_STMT_SELECT_INTO = re.compile(
    r"^\s*SELECT\s+(?P<e>.+?)\s+INTO\s+(?:STRICT\s+)?(?P<v>[A-Za-z_]\w*)"
    r"(?P<from>\s+FROM\s+.+?)?;\s*(?P<rest>.*)$",
    re.I | re.S,
)
_IF_BLOCK = re.compile(
    r"^\s*IF\s+(?P<parts>.+?)\s*END\s+IF\s*;\s*(?P<rest>.*)$",
    re.I | re.S,
)


def _translate_if(parts: str, env: dict[str, str], rest: str) -> str:
    """IF c THEN RETURN e; [ELSIF c THEN RETURN e;]* [ELSE RETURN e;]
    → CASE expression; a missing ELSE falls through to the remaining
    statements."""
    branches: list[tuple[str | None, str]] = []
    pieces = re.split(r"\bELSIF\b", parts, flags=re.I)
    else_expr = None
    for i, piece in enumerate(pieces):
        em = re.split(r"\bELSE\b", piece, flags=re.I)
        body = em[0]
        bm = re.match(
            r"^\s*(?P<c>.+?)\s+THEN\s+RETURN\s+(?P<e>.+?);\s*$",
            body,
            re.I | re.S,
        )
        if bm is None:
            raise NotImplementedError(
                "plpgsql: IF branches must each be a single "
                f"`RETURN expr;` (got {body.strip()!r})"
            )
        branches.append((bm.group("c"), bm.group("e")))
        if len(em) > 1:
            if i != len(pieces) - 1:
                raise NotImplementedError("plpgsql: ELSE before ELSIF")
            eb = re.match(
                r"^\s*RETURN\s+(?P<e>.+?);\s*$", em[1], re.I | re.S
            )
            if eb is None:
                raise NotImplementedError(
                    "plpgsql: ELSE branch must be a single `RETURN expr;`"
                )
            else_expr = eb.group("e")
    whens = " ".join(
        f"WHEN {_subst(c, env)} THEN {_subst(e, env)}"
        for c, e in branches
    )
    if else_expr is not None:
        if rest.strip():
            raise NotImplementedError(
                "plpgsql: statements after an exhaustive IF/ELSE "
                "RETURN are unreachable"
            )
        tail = _subst(else_expr, env)
    else:
        tail = _translate_stmts(rest, env)
    return f"CASE {whens} ELSE {tail} END"


def _translate_stmts(text: str, env: dict[str, str]) -> str:
    """Translate the statement sequence to ONE SQL expression (the
    function's return value)."""
    text = text.strip()
    if not text:
        raise NotImplementedError(
            "plpgsql: control flow reached END without RETURN"
        )
    if _STMT_IF.match(text):
        m = _IF_BLOCK.match(text)
        if m is None:
            raise NotImplementedError(
                "plpgsql: cannot parse IF block (nested blocks are "
                "not supported)"
            )
        return _translate_if(m.group("parts"), env, m.group("rest"))
    m = _STMT_SELECT_INTO.match(text)
    if m is not None:
        expr = m.group("e") + (m.group("from") or "")
        _check_volatile(expr, "SELECT INTO")
        sub = _subst(expr, env)
        env = {**env, m.group("v").lower(): f"SELECT {sub}"}
        return _translate_stmts(m.group("rest"), env)
    m = _STMT_ASSIGN.match(text)
    if m is not None:
        _check_volatile(m.group("e"), "assignment")
        env = {**env, m.group("v").lower(): _subst(m.group("e"), env)}
        return _translate_stmts(m.group("rest"), env)
    if re.match(r"^\s*RETURN\s+QUERY\b", text, re.I):
        # would otherwise fall into _STMT_RETURN and emit garbage SQL
        # ("SELECT QUERY SELECT ..") that only errors later at
        # registration — reject at the contract boundary instead
        raise NotImplementedError(
            "plpgsql: RETURN QUERY is only supported as the body's "
            "single statement (after declarations)"
        )
    m = _STMT_RETURN.match(text)
    if m is not None:
        if m.group("rest").strip():
            raise NotImplementedError(
                "plpgsql: statements after RETURN are unreachable"
            )
        return _subst(m.group("e"), env)
    raise NotImplementedError(
        f"plpgsql: unsupported statement {text.splitlines()[0].strip()!r} "
        "(supported: DECLARE, var := expr, SELECT .. INTO var, "
        "IF/ELSIF/ELSE with RETURN branches, RETURN, RETURN QUERY)"
    )


_FOR_LOOP = re.compile(
    r"^FOR\s+(?P<v>[A-Za-z_]\w*)\s+IN\s+(?P<q>(?:SELECT|WITH)\b.+?)"
    r"\s+LOOP\s+(?P<body>.+?)\s*END\s+LOOP\s*;?\s*(?:RETURN\s*;?)?\s*$",
    re.I | re.S,
)
_LOOP_RETURN_NEXT = re.compile(
    r"^RETURN\s+NEXT\s+(?P<e>.+?)\s*;\s*$", re.I | re.S
)
_LOOP_IF_RETURN_NEXT = re.compile(
    r"^IF\s+(?P<c>.+?)\s+THEN\s+RETURN\s+NEXT\s+(?P<e>.+?)\s*;\s*"
    r"END\s+IF\s*;\s*$",
    re.I | re.S,
)


def _translate_for_loop(fm: re.Match, env: dict[str, str]) -> str:
    """FOR r IN <query> LOOP [IF c THEN] RETURN NEXT e; [END IF;]
    END LOOP — the per-row streaming idiom of tutorial set-returning
    functions. Relational translation: the loop IS a SELECT over the
    query (projection = the RETURN NEXT expression with `r.` stripped,
    filter = the IF guard), which is both the PG semantics — FOR
    iterates the query in order, RETURN NEXT appends — and a plan
    Spark distributes instead of interpreting row-at-a-time."""
    var = fm.group("v")
    body = fm.group("body").strip()
    cond = None
    bm = _LOOP_RETURN_NEXT.match(body)
    if bm is None:
        bm = _LOOP_IF_RETURN_NEXT.match(body)
        if bm is None:
            raise NotImplementedError(
                "plpgsql: FOR loop bodies support `RETURN NEXT expr;` "
                "optionally guarded by one IF .. THEN .. END IF; "
                f"(got {body.splitlines()[0].strip()!r})"
            )
        cond = bm.group("c")
    _check_volatile(fm.group("q"), "FOR query")
    _check_volatile(bm.group("e"), "RETURN NEXT")

    def strip_var(text: str) -> str:
        # r.col → col; a bare `r` (whole-record RETURN NEXT) → *.
        # Masked spans: a literal containing 'r.' is data, not a
        # loop-variable reference
        spans = _mask_spans(text)
        text = re.sub(
            rf"\b{re.escape(var)}\s*\.\s*",
            lambda m: (
                m.group(0)
                if any(a <= m.start() < b for a, b in spans)
                else ""
            ),
            text,
            flags=re.I,
        )
        if re.fullmatch(rf"\s*{re.escape(var)}\s*", text, re.I):
            return "*"
        return text

    proj = strip_var(_subst(bm.group("e"), env))
    # RETURN NEXT (a, b) — a PG row constructor — is a COLUMN LIST
    # for a RETURNS TABLE function, not one struct column
    pm = re.fullmatch(r"\s*\((.+)\)\s*", proj, re.S)
    if pm is not None:
        from citus_spark.plans.rewrites import _split_top_level

        items = _split_top_level(pm.group(1))
        if len(items) > 1:
            proj = ", ".join(i.strip() for i in items)
    out = (
        f"SELECT {proj} FROM ({_subst(fm.group('q'), env)}) __for_row"
    )
    if cond is not None:
        out += f" WHERE {strip_var(_subst(cond, env))}"
    return out


def plpgsql_body_to_sql(body: str) -> str:
    """plpgsql function body → a single-statement SQL body
    (`SELECT <expr>` or the RETURN QUERY query) that
    plans/function_sql.py registers like any LANGUAGE sql function.
    $N parameter references pass through untouched (the caller's
    positional-substitution pass handles them)."""
    body = _strip_comments(body).strip().rstrip(";").strip()
    m = re.match(
        r"^(?:DECLARE\s+(?P<decl>.*?))?\s*BEGIN\s+(?P<main>.*?)\s*END\s*$",
        body,
        re.I | re.S,
    )
    if m is None:
        raise NotImplementedError(
            "plpgsql: body must be [DECLARE ..] BEGIN .. END"
        )
    env: dict[str, str] = {}
    decl = (m.group("decl") or "").strip()
    if decl:
        for item in decl.split(";"):
            item = item.strip()
            if not item:
                continue
            dm = re.match(
                r"^(?P<v>[A-Za-z_]\w*)\s+(?P<t>[A-Za-z_][\w ]*?"
                r"(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*"
                r"(?:(?::=|DEFAULT)\s*(?P<e>.+))?$",
                item,
                re.I | re.S,
            )
            if dm is None:
                raise NotImplementedError(
                    f"plpgsql: cannot parse declaration {item!r}"
                )
            if dm.group("t").strip().lower() in ("record", "%rowtype"):
                # loop-variable declaration — bound by FOR, carries no
                # substitutable expression
                continue
            t = _map_type(dm.group("t").strip())
            if dm.group("e") is not None:
                _check_volatile(dm.group("e"), "declaration")
                env[dm.group("v").lower()] = (
                    f"CAST({_subst(dm.group('e'), env)} AS {t})"
                )
            else:
                env[dm.group("v").lower()] = f"CAST(NULL AS {t})"
    main = m.group("main").strip()
    fm = _FOR_LOOP.match(main)
    if fm is not None:
        return _translate_for_loop(fm, env)
    qm = _STMT_RETURN_QUERY.match(main)
    if qm is not None:
        if qm.group("rest").strip():
            raise NotImplementedError(
                "plpgsql: statements after RETURN QUERY are not "
                "supported (single-query bodies only)"
            )
        return _subst(qm.group("q"), env)
    return "SELECT " + _translate_stmts(main, env)
