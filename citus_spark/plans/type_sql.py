"""PG type-system DDL: CREATE TYPE (ENUM / composite), CREATE DOMAIN,
CREATE PROCEDURE / CALL — the textual surface a pasted PG schema hits
first after tables and functions.

Spark-first mapping (no PG type OIDs exist here):
- ENUM → a string column + an auto CHECK constraint on the label set
  + an ordered-comparison shim (PG orders enums by declaration order,
  not lexically; comparisons and ORDER BY on enum-typed columns
  rewrite to array_position over the label array, which stays inside
  whole-stage codegen).
- composite → a Spark struct column; `(a, b)::type` value casts
  become named_struct, `(col).field` access becomes col.field.
- DOMAIN → its base type + the recorded DEFAULT / NOT NULL / CHECK
  constraints expanded onto every column declared with the domain
  (PG enforces domain constraints at the column; so do we).
- PROCEDURE (LANGUAGE SQL / plpgsql subset) → the body's statements
  run sequentially at CALL with the arguments substituted for the
  parameter names. COMMIT inside a plpgsql body is a no-op (this
  engine is autocommit — every statement is already durable, which
  is exactly PG's state after that COMMIT); ROLLBACK rejects loudly
  (undoing a committed statement is impossible here). LANGUAGE SQL
  bodies reject both at CALL, like PG ("invalid transaction
  termination").

↔ reference: src/backend/distributed/commands/type.c (enum/composite
propagation; regress distributed_types.sql), commands/function.c +
sql_procedure.sql (CREATE PROCEDURE/CALL), distributed_domain.sql
(domains). The reference's work is metadata *propagation* to workers;
this engine's registry IS the catalog, so what remains — and what is
implemented — is the semantics: label ordering, check enforcement,
call-time execution.
"""

from __future__ import annotations

import re

from citus_spark.plans.rewrites import (
    _masked_close_paren,
    _masked_spans,
    _split_top_level,
)

# ---------------------------------------------------------------------------
# CREATE TYPE

_ENUM = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>[A-Za-z_][\w.]*)\s+AS\s+ENUM\s*"
    r"\((?P<labels>.*)\)\s*;?\s*$",
    re.I | re.S,
)
_COMPOSITE = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>[A-Za-z_][\w.]*)\s+AS\s*"
    r"\((?P<fields>.*)\)\s*;?\s*$",
    re.I | re.S,
)
_TYPE_OTHER = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>[A-Za-z_][\w.]*)\s+AS\s+"
    r"(?P<kind>RANGE|\w+)\b",
    re.I,
)


def parse_create_type(sql: str):
    """→ ("enum", name, [labels]) | ("composite", name,
    [(field, pg_type)]) | None. Shell CREATE TYPE (no AS) and RANGE
    reject loudly — silently dropping a type definition would break
    every later use of it."""
    m = _ENUM.match(sql)
    if m:
        labels = []
        for item in _split_top_level(m.group("labels")):
            lm = re.match(r"^\s*'((?:[^']|'')*)'\s*$", item)
            if not lm:
                raise ValueError(
                    f"CREATE TYPE .. AS ENUM: bad label {item!r}"
                )
            labels.append(lm.group(1).replace("''", "'"))
        if not labels:
            raise ValueError("CREATE TYPE .. AS ENUM: no labels")
        return ("enum", m.group("name"), labels)
    m = _COMPOSITE.match(sql)
    if m:
        fields: list[tuple[str, str]] = []
        for item in _split_top_level(m.group("fields")):
            fm = re.match(
                r"^\s*([A-Za-z_]\w*)\s+(.+?)\s*(?:COLLATE\s+\S+\s*)?$",
                item,
                re.S,
            )
            if not fm:
                raise ValueError(
                    f"CREATE TYPE .. AS (..): bad attribute {item!r}"
                )
            fields.append((fm.group(1), fm.group(2).strip()))
        if not fields:
            raise ValueError("CREATE TYPE .. AS (..): no attributes")
        return ("composite", m.group("name"), fields)
    m = _TYPE_OTHER.match(sql)
    if m:
        raise NotImplementedError(
            f"CREATE TYPE .. AS {m.group('kind').upper()} is not "
            "supported (ENUM and composite types are)"
        )
    if re.match(r"^\s*CREATE\s+TYPE\s+[A-Za-z_][\w.]*\s*;?\s*$", sql, re.I):
        raise NotImplementedError(
            "shell CREATE TYPE (no AS clause) is not supported"
        )
    return None


_ALTER_TYPE = re.compile(
    r"^\s*ALTER\s+TYPE\s+(?P<name>[A-Za-z_][\w.]*)\s+(?P<action>.+?)\s*;?\s*$",
    re.I | re.S,
)


def parse_alter_type(sql: str):
    """→ (name, action dict) | None. Supported: RENAME TO, ADD VALUE
    [IF NOT EXISTS] [BEFORE|AFTER], RENAME VALUE .. TO .., SET SCHEMA.
    Anything else (ADD/DROP ATTRIBUTE, OWNER) rejects loudly."""
    m = _ALTER_TYPE.match(sql)
    if not m:
        return None
    name, action = m.group("name"), m.group("action").strip()
    am = re.match(r"^RENAME\s+TO\s+([A-Za-z_]\w*)$", action, re.I)
    if am:
        return (name, {"op": "rename", "to": am.group(1)})
    am = re.match(
        r"^ADD\s+VALUE\s+(?:IF\s+NOT\s+EXISTS\s+)?'((?:[^']|'')*)'"
        r"(?:\s+(BEFORE|AFTER)\s+'((?:[^']|'')*)')?$",
        action,
        re.I,
    )
    if am:
        return (
            name,
            {
                "op": "add_value",
                "label": am.group(1).replace("''", "'"),
                "where": (am.group(2) or "").lower() or None,
                "ref": (am.group(3) or "").replace("''", "'") or None,
                "if_not_exists": bool(
                    re.search(r"IF\s+NOT\s+EXISTS", action, re.I)
                ),
            },
        )
    am = re.match(
        r"^RENAME\s+VALUE\s+'((?:[^']|'')*)'\s+TO\s+'((?:[^']|'')*)'$",
        action,
        re.I,
    )
    if am:
        return (
            name,
            {
                "op": "rename_value",
                "from": am.group(1).replace("''", "'"),
                "to": am.group(2).replace("''", "'"),
            },
        )
    am = re.match(r"^SET\s+SCHEMA\s+([A-Za-z_]\w*)$", action, re.I)
    if am:
        return (name, {"op": "set_schema", "schema": am.group(1)})
    if re.match(r"^OWNER\s+TO\b", action, re.I):
        return (name, {"op": "noop", "tag": "ALTER TYPE OWNER"})
    raise NotImplementedError(
        f"ALTER TYPE {name} {action.split()[0].upper()} .. is not "
        "supported (RENAME TO / ADD VALUE / RENAME VALUE / SET SCHEMA "
        "are)"
    )


_DROP_TYPE = re.compile(
    r"^\s*DROP\s+(?P<what>TYPE|DOMAIN)\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<names>[A-Za-z_][\w.]*(?:\s*,\s*[A-Za-z_][\w.]*)*)\s*"
    r"(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)


def parse_drop_type(sql: str):
    """→ ("type"|"domain", [names], if_exists) | None."""
    m = _DROP_TYPE.match(sql)
    if not m:
        return None
    names = [n.strip() for n in m.group("names").split(",")]
    return (m.group("what").lower(), names, bool(m.group("ine")))


# ---------------------------------------------------------------------------
# CREATE DOMAIN

_DOMAIN = re.compile(
    r"^\s*CREATE\s+DOMAIN\s+(?P<name>[A-Za-z_][\w.]*)\s+(?:AS\s+)?"
    r"(?P<rest>.+?)\s*;?\s*$",
    re.I | re.S,
)
_DOMAIN_KW = re.compile(
    r"\b(DEFAULT|NOT\s+NULL|NULL|CHECK|CONSTRAINT|COLLATE)\b", re.I
)


def parse_create_domain(sql: str):
    """→ (name, base_pg_type, default_expr|None, not_null: bool,
    [check exprs containing VALUE]) | None."""
    m = _DOMAIN.match(sql)
    if not m:
        return None
    rest = m.group("rest")
    spans = _masked_spans(rest)
    first = None
    for km in _DOMAIN_KW.finditer(rest):
        if any(a <= km.start() < b for a, b in spans):
            continue
        first = km
        break
    base = (rest[: first.start()] if first else rest).strip()
    if not base:
        raise ValueError("CREATE DOMAIN: missing base type")
    default = None
    not_null = False
    checks: list[str] = []
    pos = first.start() if first else len(rest)
    while pos < len(rest):
        seg = rest[pos:]
        km = re.match(
            r"\s*(?:CONSTRAINT\s+[A-Za-z_]\w*\s+)?"
            r"(DEFAULT|NOT\s+NULL|NULL|CHECK|COLLATE)\b",
            seg,
            re.I,
        )
        if not km:
            raise ValueError(
                f"CREATE DOMAIN: cannot parse constraint at {seg[:40]!r}"
            )
        kw = re.sub(r"\s+", " ", km.group(1).upper())
        after = pos + km.end()
        if kw == "CHECK":
            op = rest.find("(", after)
            if op < 0:
                raise ValueError("CREATE DOMAIN: CHECK needs (..)")
            cl = _masked_close_paren(rest, op + 1, _masked_spans(rest))
            if cl < 0:
                raise ValueError("CREATE DOMAIN: unbalanced CHECK")
            checks.append(rest[op + 1 : cl].strip())
            pos = cl + 1
        elif kw == "NOT NULL":
            not_null = True
            pos = after
        elif kw == "NULL":
            pos = after
        elif kw == "COLLATE":
            nm = re.match(r"\s*\S+", rest[after:])
            pos = after + (nm.end() if nm else 0)
        else:  # DEFAULT — expression runs to the next top-level keyword
            nxt = None
            spans2 = _masked_spans(rest)
            for km2 in _DOMAIN_KW.finditer(rest, after):
                if any(a <= km2.start() < b for a, b in spans2):
                    continue
                nxt = km2.start()
                break
            default = rest[after : nxt if nxt else len(rest)].strip()
            pos = nxt if nxt else len(rest)
    return (m.group("name"), base, default, not_null, checks)


# ---------------------------------------------------------------------------
# CREATE PROCEDURE / CALL

_PROC_HEAD = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?PROCEDURE\s+"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\(",
    re.I,
)
_DOLLAR_BODY = re.compile(r"\$(?P<tag>\w*)\$(?P<body>.*)\$(?P=tag)\$", re.S)
_DROP_PROC = re.compile(
    r"^\s*DROP\s+PROCEDURE\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?:\([^)]*\))?\s*"
    r"(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_CALL = re.compile(
    r"^\s*CALL\s+(?P<name>[A-Za-z_][\w.]*)\s*\((?P<args>.*)\)\s*;?\s*$",
    re.I | re.S,
)


def parse_create_procedure(sql: str):
    """→ (name, [(param, pg_type)], language, [body statements]) |
    None. OUT/INOUT parameters reject loudly (no return channel in
    CALL here)."""
    m = _PROC_HEAD.match(sql)
    if not m:
        return None
    # balanced scan so parenthesized parameter types — numeric(18,2),
    # varchar(10) — don't truncate the list (review fix)
    close = _masked_close_paren(sql, m.end(), _masked_spans(sql))
    if close < 0:
        raise ValueError("CREATE PROCEDURE: unbalanced parameter list")
    params_text = sql[m.end() : close]
    tail = sql[close + 1 :]
    # LANGUAGE must be found OUTSIDE the (masked) body — a body
    # string literal mentioning LANGUAGE must not hijack the clause
    tail_spans = _masked_spans(tail)
    lm = next(
        (
            c
            for c in re.finditer(r"\bLANGUAGE\s+'?(\w+)'?", tail, re.I)
            if not any(a <= c.start() < b for a, b in tail_spans)
        ),
        None,
    )
    if not lm:
        raise ValueError("CREATE PROCEDURE: missing LANGUAGE")
    language = lm.group(1).lower()
    if language not in ("sql", "plpgsql"):
        raise NotImplementedError(
            f"CREATE PROCEDURE LANGUAGE {language} is not supported "
            "(sql and plpgsql are)"
        )
    bm = _DOLLAR_BODY.search(tail)
    if bm:
        body = bm.group("body")
    else:
        qm = re.search(r"\bAS\s+'((?:[^']|'')*)'", tail, re.I | re.S)
        if not qm:
            raise ValueError("CREATE PROCEDURE: missing AS $$body$$")
        body = qm.group(1).replace("''", "'")
    params: list[tuple[str, str]] = []
    for item in _split_top_level(params_text):
        if not item.strip():
            continue
        pm = re.match(
            r"^\s*(?P<mode>IN\s+|OUT\s+|INOUT\s+|VARIADIC\s+)?"
            r"(?P<pname>[A-Za-z_]\w*)\s+(?P<ptype>.+?)\s*"
            r"(?:DEFAULT\s+.+|=\s*.+)?$",
            item,
            re.I | re.S,
        )
        if not pm:
            raise ValueError(f"CREATE PROCEDURE: bad parameter {item!r}")
        mode = (pm.group("mode") or "IN").strip().upper()
        if mode in ("OUT", "INOUT", "VARIADIC"):
            raise NotImplementedError(
                f"CREATE PROCEDURE: {mode} parameters are not supported"
            )
        params.append((pm.group("pname"), pm.group("ptype").strip()))
    return (m.group("name"), params, language, split_body(body, language))


def split_body(body: str, language: str) -> list[str]:
    """Procedure body → ordered statement list. plpgsql: the single
    BEGIN..END block's statements (DECLARE sections reject — use the
    plpgsql *function* subset for computation; procedures here are
    DML sequences)."""
    text = body.strip()
    if language == "plpgsql":
        if re.match(r"^\s*DECLARE\b", text, re.I):
            raise NotImplementedError(
                "plpgsql procedures with DECLARE sections are not "
                "supported (LANGUAGE SQL or declaration-free bodies are)"
            )
        bm = re.match(r"^\s*BEGIN\b(.*)\bEND\s*;?\s*$", text, re.I | re.S)
        if not bm:
            raise ValueError(
                "plpgsql procedure body must be a BEGIN .. END block"
            )
        text = bm.group(1)
    stmts = []
    for part in _split_statements(text):
        s = part.strip()
        if s:
            stmts.append(s)
    return stmts


def _split_statements(text: str) -> list[str]:
    spans = _masked_spans(text)
    out, start = [], 0
    for i, c in enumerate(text):
        if c == ";" and not any(a <= i < b for a, b in spans):
            out.append(text[start:i])
            start = i + 1
    out.append(text[start:])
    return out


def parse_drop_procedure(sql: str):
    m = _DROP_PROC.match(sql)
    if not m:
        return None
    return (m.group("name"), bool(m.group("ine")))


def parse_call(sql: str):
    """→ (name, [arg expression strings]) | None."""
    m = _CALL.match(sql)
    if not m:
        return None
    args = [a.strip() for a in _split_top_level(m.group("args")) if a.strip()]
    return (m.group("name"), args)


def substitute_params(
    stmt: str, params: list[str], args: list[str]
) -> str:
    """Word-boundary substitution of parameter names with the CALL's
    argument expressions (parenthesized), string literals masked. PG
    resolves a name that is both a parameter and a column in favor of
    the column only inside queries over that table; this textual
    substitution always takes the parameter — same as PG's behavior in
    VALUES/SET expression positions, and the reference's own procedure
    tests prefix parameters (tt_id) to dodge the ambiguity."""
    repl = {p.lower(): f"({a})" for p, a in zip(params, args)}
    if not repl:
        return stmt
    spans = _masked_spans(stmt)
    # longest name first so a parameter that prefixes another (id /
    # id_2) can't shadow it; both boundaries closed so `cap` never
    # rewrites inside `capacity` (review fix)
    names = sorted(repl, key=len, reverse=True)
    pat = re.compile(
        r"(?<![\w.$])("
        + "|".join(re.escape(p) for p in names)
        + r")(?![\w$])(?!\s*[(.])",
        re.I,
    )

    def sub(m: re.Match) -> str:
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)
        return repl[m.group(1).lower()]

    return pat.sub(sub, stmt)


# ---------------------------------------------------------------------------
# Expression rewrites for registered types

def _re_label_array(labels: list[str]) -> str:
    quoted = ", ".join("'" + l.replace("'", "''") + "'" for l in labels)
    return f"array({quoted})"


def rewrite_type_exprs(sql: str, types: dict[str, dict]) -> str:
    """One pass over a statement for every registered type name:

    - `(e1, e2)::comp` / `ROW(e1, e2)::comp` → named_struct(..)
    - `(ident).field` → ident.field  (composite field access)
    - `'label'::enumtype` → 'label' (validated against the label set)
    - `expr::enumtype` / `expr::domain` → expr CAST to the base type

    Names resolve case-insensitively, with a schema-qualified spelling
    falling back to its last component (PG search_path behavior for
    the single implicit schema here)."""
    if not types or ("::" not in sql and ")." not in sql):
        return sql

    def resolve(name: str):
        n = name.lower()
        if n in types:
            return types[n]
        # schema-qualified spellings: the session mangles sch.name to
        # sch__name before this rewrite runs
        if n.replace("__", ".") in types:
            return types[n.replace("__", ".")]
        tail = n.split(".")[-1].split("__")[-1]
        return types.get(tail)

    # composite / row casts: (args)::type  |  ROW(args)::type
    while True:
        spans = _masked_spans(sql)
        found = None
        for m in re.finditer(
            r"(?P<row>\bROW\s*)?\((?=[^)])", sql, re.I
        ):
            if any(a <= m.start() < b for a, b in spans):
                continue
            # a '(' directly after an identifier is a CALL's argument
            # list, not a row constructor — f(x, y)::ct must reach
            # Spark intact (review fix)
            if m.group("row") is None and m.start() > 0 and (
                sql[m.start() - 1].isalnum()
                or sql[m.start() - 1] in "_.$')"
            ):
                continue
            close = _masked_close_paren(sql, m.end(), spans)
            if close < 0:
                continue
            cm = re.match(
                r"\s*::\s*([A-Za-z_][\w.]*)", sql[close + 1 :]
            )
            if not cm:
                continue
            t = resolve(cm.group(1))
            if t is None or t["kind"] != "composite":
                continue
            found = (m, close, cm, t)
            break
        if found is None:
            break
        m, close, cm, t = found
        exprs = _split_top_level(sql[m.end() : close])
        fields = t["fields"]
        if len(exprs) != len(fields):
            raise ValueError(
                f"cannot cast a {len(exprs)}-value row to composite "
                f"type with {len(fields)} attributes"
            )
        pairs = ", ".join(
            f"'{fname}', {expr.strip()}"
            for (fname, _), expr in zip(fields, exprs)
        )
        start = m.start()
        end = close + 1 + cm.end()
        sql = sql[:start] + f"named_struct({pairs})" + sql[end:]

    # scalar casts to enum / domain types
    def cast_sub(m: re.Match) -> str:
        t = resolve(m.group(2))
        if t is None:
            return m.group(0)
        if t["kind"] == "enum":
            lit = re.match(r"^'((?:[^']|'')*)'$", m.group(1))
            if lit:
                label = lit.group(1).replace("''", "'")
                if label not in t["labels"]:
                    raise ValueError(
                        f"invalid input value for enum: {label!r}"
                    )
            return m.group(1)
        if t["kind"] == "domain":
            return f"CAST({m.group(1)} AS {t['spark']})"
        return m.group(0)

    spans = _masked_spans(sql)
    out, last = [], 0
    for m in re.finditer(
        r"('(?:[^']|'')*'|[A-Za-z_][\w.]*|\d+(?:\.\d+)?)"
        r"\s*::\s*([A-Za-z_][\w.]*)",
        sql,
    ):
        # skip when the cast target itself sits inside a string
        # literal (the LHS being a literal is fine — that's the
        # 'label'::enum form)
        if any(a <= m.start(2) < b for a, b in spans) or m.start() < last:
            continue
        out.append(sql[last : m.start()])
        out.append(cast_sub(m))
        last = m.end()
    out.append(sql[last:])
    sql = "".join(out)

    # composite field access: (ident).field → ident.field. The open
    # paren must not follow an identifier character (substr(x).y is a
    # CALL, not field access) and matches inside string literals stay
    # verbatim (review fix).
    spans = _masked_spans(sql)
    out, last = [], 0
    for m in re.finditer(
        r"(?<![\w.$'])\(\s*([A-Za-z_][\w.]*)\s*\)\s*\.\s*([A-Za-z_]\w*)",
        sql,
    ):
        if any(a <= m.start() < b for a, b in spans) or m.start() < last:
            continue
        out.append(sql[last : m.start()])
        out.append(f"{m.group(1)}.{m.group(2)}")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def _masked_sub(sql: str, pattern: str, repl, flags=re.I) -> str:
    """re.sub that leaves matches inside string literals untouched."""
    spans = _masked_spans(sql)
    out, last = [], 0
    for m in re.finditer(pattern, sql, flags):
        if any(a <= m.start() < b for a, b in spans) or m.start() < last:
            continue
        out.append(sql[last : m.start()])
        out.append(repl(m))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def rewrite_enum_ordering(
    sql: str,
    col_labels: dict[str, list],
    conflicted: set[str] | None = None,
) -> str:
    """Enum columns order by declaration position, not lexically.
    Rewrites, per registered enum-typed column name (bare or
    alias-qualified — `b`, `t.b`):

    - `ref <op> 'lit'` and `'lit' <op> ref` (op in < <= > >=) →
      array_position rank comparison (non-label literals raise, like
      PG's invalid-input-value error)
    - `ref <op> ref2` where either side is an enum column → both
      sides ranked (labels must agree — comparing different enums is
      a type error in PG too)
    - `ref [NOT] BETWEEN lo AND hi` (label literals or enum refs) →
      ranked BETWEEN
    - `min(ref)` / `max(ref)` / `greatest(...)` / `least(...)` → the
      label back-mapped rank extreme
    - `ref [ASC|DESC]` items in ORDER BY lists → rank expression

    Equality needs no shim. `conflicted` columns (same name bound to
    DIFFERENT enums — or shadowed by a same-named NON-enum column —
    in two referenced tables) raise only when a rewrite site actually
    uses them; a statement that never orders or compares them is
    untouched. A final guard pass rejects any ORDERED use of an enum
    column these rewrites did not reach (e.g. comparison against a
    subquery or a computed expression): silent lexical fallback is
    never allowed (r9 ADVICE #1)."""
    if not col_labels and not conflicted:
        return sql

    def fail_conflict(col: str):
        raise NotImplementedError(
            f'column "{col}" resolves to different types across the '
            "tables this statement references (different label sets, "
            "or enum in one table and plain in another) — textual "
            "enum-order rewriting cannot scope per alias; use "
            "distinct column names"
        )

    # column-to-column comparisons FIRST (a.lvl < b.lvl): both sides
    # ranked. Runs across all enum columns at once because the two
    # sides may be different columns of the same enum type.
    _qn = r"[A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?"

    def _terminal(name: str) -> str:
        return re.split(r"\s*\.\s*", name)[-1].lower()

    _kw = {
        "all", "any", "some", "select", "case", "when", "then", "else",
        "end", "and", "or", "not", "null", "true", "false", "interval",
        "date", "timestamp", "exists", "between",
    }

    def colcmp(m: re.Match) -> str:
        lref, op, rref = m.group(1), m.group(2), m.group(3)
        lcol, rcol = _terminal(lref), _terminal(rref)
        sides = {lcol, rcol}
        if not sides & (set(col_labels) | set(conflicted or ())):
            return m.group(0)
        if sides & _kw:
            # `enumcol < ANY (...)` and friends: not a plain column
            # comparison — left for the final guard to reject
            return m.group(0)
        for c in sides & set(conflicted or ()):
            fail_conflict(c)
        llab = col_labels.get(lcol)
        rlab = col_labels.get(rcol)
        if llab is None or rlab is None or list(llab) != list(rlab):
            # enum vs plain column, or two different enums: PG has no
            # such comparison operator — reject, never compare
            # lexically
            raise NotImplementedError(
                f"cannot compare {lref!r} with {rref!r}: ordered "
                "comparison between an enum column and a column of a "
                "different type has no enum-order semantics (PG "
                "rejects it as an operator mismatch)"
            )
        arr_ = _re_label_array(llab)
        return (
            f"array_position({arr_}, {lref}) {op} "
            f"array_position({arr_}, {rref})"
        )

    if re.search(r"<=|>=|<|>", sql):
        sql = _masked_sub(
            sql,
            rf"(?<![\w.])({_qn})\s*(<=|>=|<|>)\s*({_qn})(?![\w.('])",
            colcmp,
        )

    # GREATEST/LEAST whose call body mentions ANY enum column → every
    # TOP-LEVEL argument must rank (label literal or a column of the
    # same enum; anything else — nested calls, other types — raises
    # loudly). One pass across all columns (a per-column pass would
    # re-visit its own output when two enum columns share a call);
    # balanced-paren scan, not regex, so nested-call arguments cannot
    # truncate the list (review fix — [^()]* silently skipped them,
    # leaving the call lexical).
    if re.search(r"\b(?:greatest|least)\s*\(", sql, re.I):
        sql = _rewrite_gl_calls(
            sql, col_labels, conflicted or set(), fail_conflict
        )

    for col in sorted(
        set(col_labels) | set(conflicted or ()), key=len, reverse=True
    ):
        # a column reference: optional table/alias qualifier + name
        ref = rf"(?:[A-Za-z_]\w*\s*\.\s*)?{re.escape(col)}"
        if not re.search(rf"(?<![\w.]){ref}\b", sql, re.I):
            continue
        is_conflict = conflicted and col in conflicted
        labels = col_labels.get(col) or []
        arr = _re_label_array(labels) if labels else None

        def cmp1(m: re.Match) -> str:
            if is_conflict:
                fail_conflict(col)
            lit = next(
                g for g in (m.group(1), m.group(3)) if g.startswith("'")
            )
            label = lit[1:-1].replace("''", "'")
            if label not in labels:
                # PG raises, it never silently returns zero rows —
                # and this also catches a same-named column of a
                # DIFFERENT enum slipping into the rewrite
                raise ValueError(
                    f"invalid input value for enum: {label!r}"
                )
            return (
                f"array_position({arr}, {m.group(1)}) {m.group(2)} "
                f"array_position({arr}, {m.group(3)})"
            )

        sql = _masked_sub(
            sql,
            rf"(?<![\w.])({ref})\s*(<=|>=|<|>)\s*('(?:[^']|'')*')",
            cmp1,
        )
        sql = _masked_sub(
            sql,
            rf"('(?:[^']|'')*')\s*(<=|>=|<|>)\s*((?<![\w.]){ref})(?![\w.(])",
            cmp1,
        )

        def _rank(operand: str) -> str:
            """array_position rank of a label literal (validated) or
            a column reference of the SAME enum (any registered column
            whose label list equals this one's)."""
            operand = operand.strip()
            if operand.startswith("'"):
                label = operand[1:-1].replace("''", "'")
                if label not in labels:
                    raise ValueError(
                        f"invalid input value for enum: {label!r}"
                    )
                return f"array_position({arr}, {operand})"
            if re.fullmatch(r"[A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?",
                            operand):
                other = re.split(r"\s*\.\s*", operand)[-1].lower()
                if list(col_labels.get(other, ())) == list(labels):
                    return f"array_position({arr}, {operand})"
            raise NotImplementedError(
                f"enum-ordered expression over {col!r} mixes in "
                f"operand {operand!r} that is neither a label literal "
                "nor a column of the same enum — rewrite it "
                "explicitly with array_position()"
            )

        # [NOT] BETWEEN with label-literal or same-enum bounds
        def betw(m: re.Match) -> str:
            if is_conflict:
                fail_conflict(col)
            neg = m.group(2) or ""
            return (
                f"array_position({arr}, {m.group(1)}) {neg}BETWEEN "
                f"{_rank(m.group(3))} AND {_rank(m.group(4))}"
            )

        # bounds may be label literals OR column references — _rank
        # validates (same-enum columns rank; anything else raises)
        _operand = (
            rf"'(?:[^']|'')*'"
            rf"|(?<![\w.])[A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?(?![\w.(])"
        )
        sql = _masked_sub(
            sql,
            rf"(?<![\w.])({ref})\s+(NOT\s+)?BETWEEN\s+({_operand})"
            rf"\s+AND\s+({_operand})",
            betw,
        )

        # min/max compared against a label literal: keep the whole
        # comparison in RANK space — back-mapping to the label first
        # and comparing lexically is wrong (review fix)
        def aggcmp(m: re.Match) -> str:
            if is_conflict:
                fail_conflict(col)
            return (
                f"{m.group(1).lower()}(array_position({arr}, "
                f"{m.group(2)})) {m.group(3)} {_rank(m.group(4))}"
            )

        _ordop = r"<=(?!>)|>=|<(?![>=])|>(?!=)"
        sql = _masked_sub(
            sql,
            rf"\b(min|max)\s*\(\s*((?<![\w.]){ref})\s*\)\s*"
            rf"({_ordop})\s*('(?:[^']|'')*')",
            aggcmp,
        )

        def aggcmp_rev(m: re.Match) -> str:
            if is_conflict:
                fail_conflict(col)
            return (
                f"{_rank(m.group(1))} {m.group(2)} "
                f"{m.group(3).lower()}(array_position({arr}, "
                f"{m.group(4)}))"
            )

        sql = _masked_sub(
            sql,
            rf"('(?:[^']|'')*')\s*({_ordop})\s*"
            rf"\b(min|max)\s*\(\s*((?<![\w.]){ref})\s*\)",
            aggcmp_rev,
        )

        # min/max back-mapped through the label array (masked — a
        # literal containing 'min(b)' stays text, review fix)
        def agg_sub(m: re.Match) -> str:
            if is_conflict:
                fail_conflict(col)
            fn = m.group(1).lower()
            return (
                f"element_at({arr}, CAST({fn}(array_position({arr}, "
                f"{m.group(2)})) AS INT))"
            )

        sql = _masked_sub(
            sql,
            rf"\b(min|max)\s*\(\s*((?<![\w.]){ref})\s*\)",
            agg_sub,
        )
        # ORDER BY items
        sql = _rewrite_order_items(
            sql, col, arr, is_conflict, fail_conflict
        )

    # final guard: any ORDERED use of an enum column the passes above
    # did not reach (comparison against a subquery/expression,
    # quantified comparison, BETWEEN with computed bounds) must
    # REJECT — a silent lexical comparison returns wrong rows
    # (r9 ADVICE #1). Ordered ops only: <>, !=, = and <=> are
    # order-free equality and stay untouched (review fix — the first
    # guard's bare <|> alternation matched the halves of <>).
    _g_ord_l = r"(?:<=(?!>)|>=|<(?![>=])|>(?!=))"  # op after the ref
    _g_ord_r = r"(?:<=(?!>)|>=|<(?![>=])|(?<![<>=!-])>(?!=))"  # before
    spans_g = _masked_spans(sql)
    for col in set(col_labels) | set(conflicted or ()):
        ref = rf"(?:[A-Za-z_]\w*\s*\.\s*)?{re.escape(col)}"
        leftover = (
            rf"(?<![\w.])(?:{ref})\s*{_g_ord_l}"
            rf"|(?<![\w.])(?:{ref})\s+(?:NOT\s+)?BETWEEN\b"
            rf"|{_g_ord_r}\s*(?:{ref})(?![\w.(])"
        )
        for m in re.finditer(leftover, sql, re.I):
            if any(a <= m.start() < b for a, b in spans_g):
                continue
            raise NotImplementedError(
                f"ordered use of enum column {col!r} at "
                f"...{sql[max(0, m.start() - 20):m.end() + 20]!r}... "
                "is outside the supported rewrite forms (literal/"
                "column comparisons, BETWEEN, min/max, greatest/"
                "least, ORDER BY items) — enum declaration order "
                "cannot be applied textually here; compare via "
                "array_position() explicitly"
            )
    # ...and ordered comparisons against a BACK-MAPPED label (the
    # element_at(..) result of min/max/greatest/least) — the rewrite
    # output is a label STRING, so a following </> would be lexical.
    # All back-mapped forms end in "AS INT))"; reject both directions.
    backmap = (
        rf"AS INT\)\)\s*{_g_ord_l}\s*'"
        rf"|'\s*{_g_ord_r}\s*element_at\s*\(\s*array\s*\("
    )
    for m in re.finditer(backmap, sql, re.I):
        if any(a <= m.start() < b for a, b in spans_g):
            continue
        raise NotImplementedError(
            "ordered comparison against a back-mapped enum extreme "
            f"(at ...{sql[max(0, m.start() - 30):m.end() + 10]!r}...) "
            "would compare label STRINGS lexically — compare ranks "
            "instead: array_position(<labels>, <expr>) on both sides"
        )
    return sql


def _rewrite_gl_calls(
    sql: str, col_labels: dict, conflicted: set, fail_conflict
) -> str:
    """Balanced-paren rewrite of GREATEST/LEAST calls that mention
    any enum column anywhere in their argument list: every top-level
    argument must be a label literal (validated) or a column of the
    same enum — anything else (nested calls, other types) raises
    loudly — and the extreme is back-mapped to its label. Calls not
    mentioning an enum column pass through untouched."""
    from citus_spark.plans.rewrites import _split_top_level

    spans = _masked_spans(sql)
    ref_pats = {
        c: re.compile(
            rf"(?<![\w.])(?:[A-Za-z_]\w*\s*\.\s*)?{re.escape(c)}"
            rf"(?![\w.(])",
            re.I,
        )
        for c in set(col_labels) | set(conflicted)
    }
    pat = re.compile(r"\b(greatest|least)\s*\(", re.I)
    out, pos = [], 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            break
        if any(a <= m.start() < b for a, b in spans):
            out.append(sql[pos:m.end()])
            pos = m.end()
            continue
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            sp = next((s for s in spans if s[0] <= i < s[1]), None)
            if sp:
                i = sp[1]
                continue
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        body = sql[m.end():i - 1]
        body_spans = _masked_spans(body)
        mentioned = [
            c for c, rp in ref_pats.items()
            if any(
                not any(a <= hit.start() < b for a, b in body_spans)
                for hit in rp.finditer(body)
            )
        ]
        if not mentioned:
            out.append(sql[pos:m.end()])
            pos = m.end()
            continue
        for c in mentioned:
            if c in conflicted:
                fail_conflict(c)
        labels = col_labels[mentioned[0]]
        for c in mentioned[1:]:
            if list(col_labels[c]) != list(labels):
                raise NotImplementedError(
                    f"{m.group(1).lower()}() mixes enum columns of "
                    f"different label sets ({mentioned[0]!r} vs "
                    f"{c!r}) — PG rejects this as a type mismatch"
                )
        arr = _re_label_array(labels)

        def _rank(operand: str) -> str:
            operand = operand.strip()
            if operand.startswith("'"):
                label = operand[1:-1].replace("''", "'")
                if label not in labels:
                    raise ValueError(
                        f"invalid input value for enum: {label!r}"
                    )
                return f"array_position({arr}, {operand})"
            if re.fullmatch(r"[A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?",
                            operand):
                other = re.split(r"\s*\.\s*", operand)[-1].lower()
                if list(col_labels.get(other, ())) == list(labels):
                    return f"array_position({arr}, {operand})"
            raise NotImplementedError(
                f"enum-ordered {m.group(1).lower()}() mixes in "
                f"operand {operand!r} that is neither a label literal "
                "nor a column of the same enum — rewrite it "
                "explicitly with array_position()"
            )

        ranked = ", ".join(_rank(p) for p in _split_top_level(body))
        out.append(sql[pos:m.start()])
        out.append(
            f"element_at({arr}, CAST({m.group(1).lower()}({ranked}) "
            f"AS INT))"
        )
        pos = i
    out.append(sql[pos:])
    return "".join(out)


_ORDER_BY = re.compile(r"\bORDER\s+BY\b", re.I)
_ORDER_END = re.compile(
    r"\b(LIMIT|OFFSET|FETCH|WINDOW|UNION|INTERSECT|EXCEPT|ROWS|RANGE|GROUPS)\b"
    r"|[;)]",
    re.I,
)


def _rewrite_order_items(
    sql: str, col: str, arr: str | None, is_conflict=False,
    fail_conflict=None,
) -> str:
    """Replace `[alias.]col [ASC|DESC] [NULLS ..]` items in every
    ORDER BY list (top-level and window clauses) with the
    declaration-order rank expression."""
    result = sql
    offset = 0
    for ob in _ORDER_BY.finditer(sql):
        start = ob.end()
        spans = _masked_spans(sql)
        if any(a <= ob.start() < b for a, b in spans):
            continue
        depth = 0
        end = len(sql)
        i = start
        while i < len(sql):
            if any(a <= i < b for a, b in spans):
                i += 1
                continue
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0:
                m = _ORDER_END.match(sql, i)
                if m and sql[i] not in "()":
                    end = i
                    break
            i += 1
        seg = sql[start:end]
        items = _split_top_level(seg)
        changed = False
        new_items = []
        for item in items:
            im = re.match(
                rf"^(\s*)((?:[A-Za-z_]\w*\s*\.\s*)?{re.escape(col)})"
                rf"(\s+(?:ASC|DESC))?"
                rf"(\s+NULLS\s+(?:FIRST|LAST))?(\s*)$",
                item,
                re.I,
            )
            if im:
                if is_conflict:
                    fail_conflict(col)
                changed = True
                rank = f"array_position({arr}, {im.group(2)})"
                new_items.append(
                    f"{im.group(1)}{rank}{im.group(3) or ''}"
                    f"{im.group(4) or ''}{im.group(5) or ''}"
                )
                continue
            # an ORDER BY item that IS a back-mapped extreme
            # (element_at(arr, CAST(min(...) AS INT)) from agg_sub /
            # the gl pass): sorting the LABEL would be lexical —
            # unwrap to the inner rank expression, which carries the
            # declaration order (the sort key's value is never
            # projected, so the unwrap is order-exact)
            if arr is not None:
                bm = re.match(
                    rf"^(\s*)element_at\({re.escape(arr)}, "
                    rf"CAST\((?P<inner>.*) AS INT\)\)"
                    rf"(\s+(?:ASC|DESC))?"
                    rf"(\s+NULLS\s+(?:FIRST|LAST))?(\s*)$",
                    item,
                    re.I | re.S,
                )
                if bm:
                    changed = True
                    new_items.append(
                        f"{bm.group(1)}{bm.group('inner')}"
                        f"{bm.group(3) or ''}{bm.group(4) or ''}"
                        f"{bm.group(5) or ''}"
                    )
                    continue
            new_items.append(item)
        if changed:
            # _split_top_level strips items — rebuild with explicit
            # spacing so "ORDER BY" keeps its separator
            new_seg = " " + ", ".join(i.strip() for i in new_items) + " "
            result = (
                result[: start + offset]
                + new_seg
                + result[end + offset :]
            )
            offset += len(new_seg) - len(seg)
    return result


def _escape_literal_backslashes(expr: str) -> str:
    """Double backslashes inside string literals: PG (standard
    conforming strings) keeps them verbatim, Spark's SQL parser
    consumes them as escapes."""
    spans = _masked_spans(expr)
    out = []
    last = 0
    for a, b in spans:
        out.append(expr[last:a])
        out.append(expr[a:b].replace("\\", "\\\\"))
        last = b
    out.append(expr[last:])
    return "".join(out)


# ---------------------------------------------------------------------------
# CREATE TABLE pre-pass: expand UDT-typed columns' implied constraints

def expand_udt_columns(sql: str, types: dict[str, dict]):
    """CREATE TABLE text → (rewritten text, {column: enum_type_name}).
    Enum columns gain a CHECK on the label set; domain columns gain
    the domain's DEFAULT / NOT NULL / CHECKs (VALUE → column). The
    type NAMES stay in place — parse_create_table maps them to Spark
    types through the udts dict."""
    if not types:
        return sql, {}
    m = re.match(
        r"^(?P<head>\s*CREATE\s+(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+"
        r"|UNLOGGED\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r"[A-Za-z_][\w.]*\s*\()",
        sql,
        re.I,
    )
    if not m:
        return sql, {}
    open_end = m.end()
    close = _masked_close_paren(sql, open_end, _masked_spans(sql))
    if close < 0:
        return sql, {}
    body = sql[open_end:close]
    items = _split_top_level(body)
    enum_cols: dict[str, str] = {}
    out_items = []
    changed = False
    for item in items:
        cm = re.match(
            r"^(\s*)([A-Za-z_]\w*)\s+([A-Za-z_][\w.]*)(\s*\[\s*\])?"
            r"(?P<rest>.*)$",
            item,
            re.S,
        )
        if cm:
            tname = cm.group(3).lower()
            t = (
                types.get(tname)
                or types.get(tname.replace("__", "."))
                or types.get(tname.split(".")[-1].split("__")[-1])
            )
            if t is not None and not cm.group(4):
                col = cm.group(2)
                extra = ""
                if t["kind"] == "enum":
                    quoted = ", ".join(
                        "'" + l.replace("'", "''") + "'"
                        for l in t["labels"]
                    )
                    extra = f" CHECK ({col} IN ({quoted}))"
                    enum_cols[col] = t["name"]
                elif t["kind"] == "domain":
                    parts = []
                    rest_spans = _masked_spans(cm.group("rest"))
                    # a real column DEFAULT, not the DEFAULT of an FK
                    # referential action (ON DELETE/UPDATE SET
                    # DEFAULT — review fix)
                    has_own_default = any(
                        not any(
                            a <= dm.start() < b for a, b in rest_spans
                        )
                        for dm in re.finditer(
                            r"\bDEFAULT\b", cm.group("rest"), re.I
                        )
                        if not re.search(
                            r"\bSET\s*$",
                            cm.group("rest")[: dm.start()],
                            re.I,
                        )
                    )
                    # PG precedence: a column's own DEFAULT overrides
                    # the domain's (review fix — prepending both
                    # produced the unparseable '1 DEFAULT 5')
                    if t.get("default") is not None and not has_own_default:
                        parts.append(f"DEFAULT {t['default']}")
                    if t.get("not_null"):
                        parts.append("NOT NULL")
                    for chk in t.get("checks") or []:
                        expr = re.sub(
                            r"(?<![\w.])VALUE(?![\w.])", col, chk,
                            flags=re.I,
                        )
                        if "~" in expr:
                            # PG regex operators in domain checks
                            # (us_postal_code shape) must become
                            # Spark expressions before the constraint
                            # machinery analyzes them; PG string
                            # literals keep backslashes verbatim
                            # (standard_conforming_strings), Spark's
                            # parser consumes them — double them so
                            # '\d' survives parsing as \d
                            from citus_spark.plans.rewrites import (
                                pg_regex_ops,
                            )

                            expr = pg_regex_ops(expr)
                            expr = _escape_literal_backslashes(expr)
                        parts.append(f"CHECK ({expr})")
                    extra = (" " + " ".join(parts)) if parts else ""
                if extra:
                    changed = True
                    item = (
                        f"{cm.group(1)}{col} {cm.group(3)}{extra}"
                        f"{cm.group('rest')}"
                    )
        out_items.append(item)
    if not changed and not enum_cols:
        return sql, enum_cols
    return sql[:open_end] + ", ".join(
        i.strip() for i in out_items
    ) + sql[close:], enum_cols
