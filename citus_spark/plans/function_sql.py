"""CREATE FUNCTION .. LANGUAGE sql → Spark SQL UDFs.

↔ reference src/test/regress/sql/multi_sql_function.sql /
distributed_functions.sql (Citus propagates function DDL to every
worker so queries can call them anywhere — create_distributed_function).
The Spark analog IS the session-registered SQL UDF: CREATE TEMPORARY
FUNCTION ... RETURN <expr> ships with the plan to every executor and
stays inside whole-stage codegen, so distribution is free —
create_distributed_function() is accepted as a no-op for exactly that
reason.

Supported: scalar functions with named or unnamed typed parameters
($1-style positional references resolve to the declared parameters)
and a single-statement SQL body (a bare SELECT of one expression, or
a full query that becomes a scalar subquery — correlated references
to the parameters work); parameter DEFAULTs pass through (Spark SQL
UDFs take DEFAULT natively). LANGUAGE plpgsql translates through the
tutorial subset in plans/plpgsql_sql.py (DECLARE / assignment /
SELECT INTO / IF-RETURN / RETURN / RETURN QUERY). Rejected loudly:
other languages, OUT/INOUT parameters, plpgsql beyond the subset.
"""

from __future__ import annotations

import re

from citus_spark.plans.ddl_sql import _map_type

_HEAD = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?FUNCTION\s+"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\((?P<params>[^)]*)\)\s*"
    r"RETURNS\s+(?P<ret>SETOF\s+\w+|TABLE\s*\([^)]*\)|"
    r"[A-Za-z_][\w ]*?(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s+"
    r"(?P<tail>(?:AS|LANGUAGE|IMMUTABLE|STABLE|VOLATILE|STRICT|COST|"
    r"PARALLEL|CALLED|SECURITY)\b.*)$",
    re.I | re.S,
)
_DROP_FN = re.compile(
    r"^\s*DROP\s+FUNCTION\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?:\([^)]*\))?\s*"
    r"(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)


def _extract_body(tail: str) -> tuple[str, str]:
    """(body, language) from the AS/LANGUAGE tail — dollar-quoted
    ($$..$$ / $tag$..$tag$) or single-quoted bodies, either keyword
    order."""
    lm = re.search(r"\bLANGUAGE\s+(\w+)", tail, re.I)
    language = lm.group(1).lower() if lm else "sql"
    dm = re.search(r"\$(?P<tag>[A-Za-z_]*)\$", tail)
    if dm:
        close = tail.find(dm.group(0), dm.end())
        if close < 0:
            raise ValueError("unterminated dollar-quoted function body")
        return tail[dm.end() : close].strip(), language
    qm = re.search(r"\bAS\s+'((?:[^']|'')*)'", tail, re.I | re.S)
    if qm:
        return qm.group(1).replace("''", "'").strip(), language
    raise ValueError("CREATE FUNCTION: no AS body found")


def parse_create_function(sql: str):
    """→ (spark_ddl, name, or_replace) or None (not CREATE FUNCTION)."""
    if not re.match(
        r"\s*CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\b", sql, re.I
    ):
        return None
    m = _HEAD.match(sql)
    if m is None:
        raise ValueError("CREATE FUNCTION: cannot parse header")
    ret = m.group("ret").strip()
    body, language = _extract_body(m.group("tail"))
    if language == "plpgsql":
        # tutorial-subset translation (plans/plpgsql_sql.py): the
        # body becomes one SQL statement and registers through the
        # same SQL-UDF path below; unsupported constructs reject
        # loudly inside the translator
        from citus_spark.plans.plpgsql_sql import plpgsql_body_to_sql

        body = plpgsql_body_to_sql(body)
    elif language not in ("sql",):
        raise NotImplementedError(
            f"CREATE FUNCTION: LANGUAGE {language} is not supported "
            "(sql and the plpgsql tutorial subset only)"
        )
    params = []
    pnames = []
    raw = m.group("params").strip()
    if raw:
        from citus_spark.plans.rewrites import _split_top_level

        def split_default(text: str):
            """`... DEFAULT expr` / `... = expr` → (head, expr|None).
            The expr may contain commas/parens — the item was split
            paren- and literal-aware above, so only the FIRST
            separator matters here."""
            dm = re.search(r"\s+DEFAULT\s+|^DEFAULT\s+", text, re.I)
            if dm is None:
                dm = re.search(r"\s*=\s*", text)
            if dm is None:
                return text, None
            return text[: dm.start()], text[dm.end() :].strip()

        # top-level split: a DEFAULT like greatest(1, 2) keeps its
        # commas (paren/literal-aware, same splitter the rewrites use)
        for idx, item in enumerate(_split_top_level(raw), start=1):
            # PG allows fully unnamed parameters (`f(int, text)`,
            # `f(int DEFAULT 5)`) — referenced in the body as $1, $2.
            # A bare type parses as an unnamed parameter with a
            # synthesized name.
            item = item.strip()
            head, default = split_default(item)
            try:
                t = _map_type(head.strip())
                pname = f"__p{idx}"
            except ValueError:
                pm = re.match(
                    r"\s*(?:IN\s+)?([A-Za-z_]\w*)\s+(.+?)\s*$",
                    head, re.I | re.S,
                )
                if pm is None or pm.group(1).upper() in ("OUT", "INOUT"):
                    raise NotImplementedError(
                        f"CREATE FUNCTION: cannot parse parameter {item!r} "
                        "(named IN parameters only)"
                    )
                pname, t = pm.group(1), _map_type(pm.group(2))
            pnames.append(pname)
            # PG DEFAULT (`DEFAULT expr` or `= expr`) passes through —
            # Spark SQL UDFs take DEFAULT natively
            params.append(
                f"{pname} {t} DEFAULT {default}" if default else f"{pname} {t}"
            )

    def sub_positional(text: str) -> str:
        """$N → the Nth parameter's name (PG positional references).
        $N inside a string literal is data, not a reference — PG
        substitutes parameters only in code positions."""
        from citus_spark.plans.rewrites import _masked_spans

        spans = _masked_spans(text)

        def repl(pm2):
            if any(a <= pm2.start() < b for a, b in spans):
                return pm2.group(0)
            n = int(pm2.group(1))
            if not 1 <= n <= len(pnames):
                raise ValueError(
                    f"CREATE FUNCTION: ${n} references parameter {n} "
                    f"but only {len(pnames)} are declared"
                )
            return pnames[n - 1]

        return re.sub(r"\$(\d+)", repl, text)

    body = sub_positional(body)
    body = body.rstrip().rstrip(";")
    sm = re.match(r"\s*SELECT\s+(.+)$", body, re.I | re.S)
    if sm is None:
        raise NotImplementedError(
            "CREATE FUNCTION: body must be a single SELECT"
        )
    # set-returning forms → Spark SQL TABLE functions (called in FROM
    # position, `SELECT * FROM fn(args)` — same as PG). SETOF <type>
    # names its one column after the function, PG's rule.
    tm = re.match(r"TABLE\s*\((.*)\)\s*$", ret, re.I | re.S)
    setof = re.match(r"SETOF\s+(\w+)\s*$", ret, re.I)
    if tm or setof:
        if tm:
            cols = []
            for item in tm.group(1).split(","):
                cm = re.match(r"\s*([A-Za-z_]\w*)\s+(.+?)\s*$", item)
                if cm is None:
                    raise ValueError(
                        f"RETURNS TABLE: cannot parse column {item!r}"
                    )
                cols.append(f"{cm.group(1)} {_map_type(cm.group(2))}")
            ret_sig = f"TABLE({', '.join(cols)})"
        else:
            base = m.group("name").rsplit(".", 1)[-1]
            ret_sig = f"TABLE({base} {_map_type(setof.group(1))})"
        ddl = (
            f"CREATE OR REPLACE TEMPORARY FUNCTION {m.group('name')}"
            f"({', '.join(params)}) RETURNS {ret_sig} RETURN {body}"
        )
        return ddl, m.group("name"), bool(m.group("replace"))
    # bare expression select → RETURN expr; anything with FROM/WHERE →
    # scalar subquery (correlated parameter references resolve)
    if re.search(r"\bFROM\b|\bWHERE\b", body, re.I):
        ret_clause = f"RETURN ({body})"
    else:
        ret_clause = f"RETURN {sm.group(1)}"
    ddl = (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {m.group('name')}"
        f"({', '.join(params)}) RETURNS {_map_type(ret)} {ret_clause}"
    )
    return ddl, m.group("name"), bool(m.group("replace"))


def parse_drop_function(sql: str):
    m = _DROP_FN.match(sql)
    if m is None:
        return None
    return m.group("name"), bool(m.group("ine"))
