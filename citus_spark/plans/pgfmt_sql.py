"""PG formatting / row / set-returning spellings:

- ``to_char(ts, 'fmt')`` / ``to_date(s, 'fmt')`` / ``to_timestamp(s,
  'fmt')`` with a LITERAL template: PG's format patterns translate to
  Spark's (JDK) datetime patterns and the call becomes date_format /
  to_date / to_timestamp. Numeric to_char templates ('999.99') are
  rejected loudly. PG blank-pads Day/Month to 9 chars unless FM is
  given; this engine always behaves like FM mode (documented
  divergence — FM prefixes are accepted and stripped).
- FROM-position ``unnest(arr) [WITH ORDINALITY]`` → LATERAL
  explode / posexplode subquery (ordinality is 1-based and appended
  last, like PG). Multi-argument unnest (PG zips) is not supported.
- ``ROW(a, b, ...)`` → ``struct(a, b, ...)`` — composite values;
  Spark's struct ordering/equality matches PG row comparison
  (element-wise, left to right).

↔ reference regress: multi_behavioral_analytics_basics.sql (to_char
rollups), row_types.sql, subquery_and_cte.sql (unnest fixtures).
"""

from __future__ import annotations

import re

from citus_spark.plans.rewrites import (
    _code_iter,
    _find_call_span,
    _in_from_clause,
    _map_code,
    _masked_spans,
    _split_top_level,
)

# PG template patterns → Spark datetime patterns, longest-first.
# Case-sensitive where PG is (Mon vs MON vs mon all mean abbreviated
# month in PG; textual case is PG output case — Spark always titles,
# so upper/lower variants map to the same pattern: divergence noted).
_PAT = [
    ("HH24", "HH"), ("HH12", "hh"),
    ("YYYY", "yyyy"), ("YYY", "yyy"), ("YY", "yy"),
    ("MONTH", "MMMM"), ("Month", "MMMM"), ("month", "MMMM"),
    ("MON", "MMM"), ("Mon", "MMM"), ("mon", "MMM"),
    ("DAY", "EEEE"), ("Day", "EEEE"), ("day", "EEEE"),
    ("DY", "EEE"), ("Dy", "EEE"), ("dy", "EEE"),
    ("DDD", "DDD"), ("DD", "dd"), ("ID", "u"),
    ("MI", "mm"), ("MM", "MM"), ("MS", "SSS"),
    ("SS", "ss"), ("AM", "a"), ("PM", "a"), ("HH", "hh"),
    ("TZ", "zzz"), ("OF", "x"), ("Q", "Q"), ("WW", "ww"), ("W", "W"),
    ("J", None), ("IYYY", None), ("IW", None),  # no Spark analog
]


def translate_datetime_format(fmt: str) -> str:
    """PG to_char template → Spark datetime pattern. Raises on
    numeric templates and untranslatable fields."""
    if re.search(r"[90]", fmt):
        raise ValueError(
            f"to_char numeric template {fmt!r} is not supported — "
            "use format_number()/printf()"
        )
    out = []
    i = 0
    while i < len(fmt):
        if fmt.startswith("FM", i) or fmt.startswith("fm", i):
            i += 2  # fill mode: our output is always FM-like
            continue
        if fmt[i] == '"':  # quoted literal text in PG templates
            j = fmt.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in template {fmt!r}")
            out.append("'" + fmt[i + 1 : j].replace("'", "''") + "'")
            i = j + 1
            continue
        for pg, spark in _PAT:
            if fmt.startswith(pg, i):
                if spark is None:
                    raise ValueError(
                        f"to_char field {pg!r} has no Spark pattern"
                    )
                out.append(spark)
                i += len(pg)
                break
        else:
            c = fmt[i]
            if c.isalpha():
                raise ValueError(
                    f"unrecognized to_char field at {fmt[i:]!r}"
                )
            # separators pass through; quote alphanumerics never reach
            # here so no escaping needed
            out.append(c)
            i += 1
    return "".join(out)


_TO_FMT = re.compile(r"\b(to_char|to_date|to_timestamp)\s*\(", re.I)
_FN_MAP = {
    "to_char": "date_format",
    "to_date": "to_date",
    "to_timestamp": "to_timestamp",
}


def pg_to_char(sql: str) -> str:
    """Rewrite the two-argument literal-template forms. One-argument
    to_timestamp(epoch) / to_date(str) pass through (Spark-native)."""
    from citus_spark.plans.rewrites import _next_call

    start = 0
    while True:
        m, i, _ = _next_call(sql, _TO_FMT, start)
        if m is None:
            return sql
        args = _split_top_level(sql[m.end() : i])
        if len(args) != 2 or not re.fullmatch(
            r"'(?:[^']|'')*'", args[1].strip()
        ):
            # 1-arg or computed-format form: Spark-native — skip past
            start = m.end()
            continue
        fmt = args[1].strip()[1:-1].replace("''", "'")
        fn_name = m.group(1).lower()
        # to_date/to_timestamp are VALID Spark functions: a format
        # already in Spark's dialect must pass through untouched (the
        # 'rewrites never change a working query' invariant). Only a
        # template carrying a PG-exclusive field is claimed. to_char
        # does not exist in Spark — always translated.
        if fn_name != "to_char" and not re.search(
            r"YYYY|HH24|HH12|MI|MON|DAY|\bDY\b|FM|AM|PM", fmt
        ):
            start = m.end()
            continue
        spark_fmt = translate_datetime_format(fmt)
        fn = _FN_MAP[fn_name]
        # escape for embedding in a SQL string literal (quoted
        # template text becomes 'xx' in the Java pattern)
        lit = spark_fmt.replace("'", "''")
        repl = f"{fn}({args[0]}, '{lit}')"
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


_UNNEST = re.compile(r"\bunnest\s*\(", re.I)
_KW_STOP = (
    "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "CROSS",
    "INNER", "LEFT", "RIGHT", "FULL", "UNION", "INTERSECT", "EXCEPT",
    "HAVING", "AS", "WITH",
)


def pg_unnest(sql: str) -> str:
    """FROM-position unnest → LATERAL explode/posexplode subquery.
    Default output column name is `unnest` (PG); WITH ORDINALITY
    appends a 1-based bigint ordinal as the LAST column."""
    spans = _masked_spans(sql)

    def in_code(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next(
        (
            x
            for x in _UNNEST.finditer(sql)
            if in_code(x.start()) and _in_from_clause(sql, spans, x.start())
        ),
        None,
    )
    if m is None:
        return sql
    head = sql[: m.start()].rstrip()
    lateral = not re.search(r"\bFROM\s*$", head, re.I)
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
        raise ValueError("unbalanced parentheses in unnest")
    args = sql[m.end() : i]
    arg_list = _split_top_level(args)
    rest = sql[i + 1 :]
    om = re.match(r"\s*WITH\s+ORDINALITY\b", rest, re.I)
    ordinality = om is not None
    if ordinality:
        rest = rest[om.end() :]
    lat = "LATERAL " if lateral else ""
    if len(arg_list) > 1:
        # multi-argument unnest — PG zip semantics: arrays walk in
        # lock-step, shorter ones NULL-pad (arrays_zip does exactly
        # this). Expressions are aliased in an inner subquery so the
        # zipped struct's fields carry known names. PG names every
        # output column `unnest` (unusable duplicates in Spark), so
        # the defaults are unnest, unnest_1, ... — real statements
        # alias them anyway: AS t(c1, c2[, ord]).
        n = len(arg_list)
        cols = ["unnest"] + [f"unnest_{j}" for j in range(1, n)]
        ordcol, alias = "ordinality", ""
        am = re.match(
            r"\s*(?:AS\s+)?([A-Za-z_]\w*)"
            r"(?:\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\))?",
            rest,
            re.I,
        )
        if am and am.group(1).upper() not in _KW_STOP:
            alias = f" {am.group(1)}"
            if am.group(2):
                names = [
                    c.strip() for c in am.group(2).split(",") if c.strip()
                ]
                if ordinality and len(names) == n + 1:
                    cols, ordcol = names[:n], names[n]
                elif len(names) == n:
                    cols = names
                else:
                    raise ValueError(
                        f"unnest alias names {len(names)} columns; the "
                        f"function returns {n + (1 if ordinality else 0)}"
                    )
            rest = rest[am.end() :]
        us = [f"__u{j}" for j in range(n)]
        # PG treats a NULL array as empty here (the other arguments
        # still emit, NULL-padded); Spark's arrays_zip(NULL, ..) is
        # NULL and would silently drop the row — coalesce restores PG
        inner = ", ".join(
            f"coalesce(({a.strip()}), array()) AS {u}"
            for a, u in zip(arg_list, us)
        )
        zipped = ", ".join(us)
        outer = ", ".join(f"z.{u} AS {c}" for u, c in zip(us, cols))
        if ordinality:
            sub = (
                f"(SELECT {outer}, CAST(p + 1 AS BIGINT) AS {ordcol} "
                f"FROM (SELECT posexplode(arrays_zip({zipped})) AS (p, z) "
                f"FROM (SELECT {inner})))"
            )
        else:
            sub = (
                f"(SELECT {outer} "
                f"FROM (SELECT explode(arrays_zip({zipped})) AS z "
                f"FROM (SELECT {inner})))"
            )
        return pg_unnest(f"{sql[: m.start()]}{lat}{sub}{alias}{rest}")
    col, ordcol, alias = "unnest", "ordinality", ""
    am = re.match(
        r"\s*(?:AS\s+)?([A-Za-z_]\w*)"
        r"(?:\s*\(\s*([A-Za-z_]\w*)(?:\s*,\s*([A-Za-z_]\w*))?\s*\))?",
        rest,
        re.I,
    )
    if am and am.group(1).upper() not in _KW_STOP:
        alias = f" {am.group(1)}"
        if am.group(2):
            col = am.group(2)
        else:
            # PG: a bare alias on a scalar-returning function names
            # the COLUMN too (`FROM unnest(a) AS w` → column w)
            col = am.group(1)
        if am.group(3):
            ordcol = am.group(3)
        rest = rest[am.end() :]
    if ordinality:
        sub = (
            f"(SELECT c AS {col}, CAST(p + 1 AS BIGINT) AS {ordcol} "
            f"FROM (SELECT posexplode({args}) AS (p, c)))"
        )
    else:
        sub = f"(SELECT explode({args}) AS {col})"
    return pg_unnest(f"{sql[: m.start()]}{lat}{sub}{alias}{rest}")


_ROW_CTOR = re.compile(r"\bROW\s*\(", re.I)


def pg_row_constructor(sql: str) -> str:
    """ROW(a, b) → struct(a, b) — PG composite-value constructor.
    struct comparison in Spark is element-wise left-to-right, the
    same order PG defines for row comparison."""
    spans = _masked_spans(sql)
    out, last = [], 0
    for m in _ROW_CTOR.finditer(sql):
        if any(a <= m.start() < b for a, b in spans):
            continue
        out.append(sql[last : m.start()])
        out.append("struct(")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


# PG 14 date_bin(stride, source, origin) — arbitrary-stride time
# bucketing (↔ the reference's timeseries rollup idiom; PG docs
# §9.9.3). Spark has no date_bin; with a LITERAL interval stride the
# call compiles to pure timestamp arithmetic (unix_seconds is
# codegen'd): origin + floor((ts - origin) / stride) * stride.
# Sub-second strides and month/year strides (variable length — PG
# rejects those too) raise.
_DATE_BIN = re.compile(r"\bdate_bin\s*\(", re.I)
_STRIDE_UNITS = {
    "second": 1, "seconds": 1, "sec": 1, "secs": 1,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60,
    "hour": 3600, "hours": 3600, "hr": 3600, "hrs": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _stride_seconds(text: str) -> int:
    """STRICT parse: the whole stride must be `<int> <unit>` pairs —
    fractional ('1.5 hours'), signed ('-1 hour'), or trailing junk
    raises instead of silently mis-bucketing."""
    if not re.fullmatch(
        r"\s*(?:\d+\s*[A-Za-z]+\s*)+", text
    ):
        raise ValueError(
            f"date_bin: cannot parse stride {text!r} — whole positive "
            "'<n> <unit>' terms only (no fractions or signs)"
        )
    total = 0
    for num, unit in re.findall(r"(\d+)\s*([A-Za-z]+)", text):
        if unit.lower() not in _STRIDE_UNITS:
            raise ValueError(
                f"date_bin: stride unit {unit!r} is not supported "
                "(fixed-length units up to weeks; months/years vary)"
            )
        total += int(num) * _STRIDE_UNITS[unit.lower()]
    if total <= 0:
        raise ValueError(f"date_bin: cannot parse stride {text!r}")
    return total


def pg_date_bin(sql: str) -> str:
    from citus_spark.plans.rewrites import _next_call

    start = 0
    while True:
        m, i, _ = _next_call(sql, _DATE_BIN, start)
        if m is None:
            return sql
        args = _split_top_level(sql[m.end() : i])
        if len(args) != 3:
            raise ValueError("date_bin takes (stride, source, origin)")
        sm = re.match(
            r"\s*INTERVAL\s+'([^']+)'\s*$", args[0], re.I
        )
        if sm is None:
            raise ValueError(
                "date_bin: the stride must be a literal INTERVAL"
            )
        s = _stride_seconds(sm.group(1))
        src, origin = args[1].strip(), args[2].strip()
        repl = (
            f"timestampadd(SECOND, CAST(floor((unix_seconds({src}) - "
            f"unix_seconds({origin})) / {s}) * {s} AS BIGINT), {origin})"
        )
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        start = m.start() + len(repl)


# SQL-standard BETWEEN SYMMETRIC — bounds in either order
# (↔ reference multi_complex_expressions.sql). Spark only has plain
# BETWEEN; least/greatest normalize the bounds. Operands are scanned
# structurally (NOT a token regex): the low bound ends at the first
# top-level AND, the high bound at the next top-level boolean
# connective / clause keyword / scope close — so multi-token bounds
# like `DATE '1995-01-01'` or `f(a, b) + 1` rewrite correctly.
_BETWEEN_SYM = re.compile(r"\bBETWEEN\s+SYMMETRIC\s+", re.I)
_HI_END = re.compile(
    r"\b(AND|OR|ORDER|GROUP|HAVING|LIMIT|WINDOW|UNION|INTERSECT|"
    r"EXCEPT|FETCH|OFFSET|THEN|ELSE|END|WHEN)\b",
    re.I,
)
_KW_AND = re.compile(r"\bAND\b", re.I)


def pg_between_symmetric(sql: str) -> str:
    from citus_spark.plans.rewrites import _masked_spans as _spans_of

    while True:
        spans = _spans_of(sql)
        m = next(
            (
                x
                for x in _BETWEEN_SYM.finditer(sql)
                if not any(a <= x.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return sql

        def scan(start: int, stop_pat) -> tuple[int, "re.Match | None"]:
            """Index of the first depth-0 unmasked stop keyword (and
            its match) from `start`; (len(sql), None) if none."""
            depth, j = 0, start
            while j < len(sql):
                sp = next((s for s in spans if s[0] <= j < s[1]), None)
                if sp:
                    j = sp[1]
                    continue
                c = sql[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        return j, None
                    depth -= 1
                elif c == ",":
                    if depth == 0:
                        return j, None
                elif depth == 0 and c.isalpha():
                    km = stop_pat.match(sql, j)
                    if km:
                        return j, km
                    # skip the rest of this word
                    while j < len(sql) and (
                        sql[j].isalnum() or sql[j] == "_"
                    ):
                        j += 1
                    continue
                j += 1
            return len(sql), None

        lo_end, am = scan(m.end(), _KW_AND)
        if am is None:
            raise ValueError("BETWEEN SYMMETRIC without AND")
        hi_start = am.end()
        hi_end, _ = scan(hi_start, _HI_END)
        lo = sql[m.end() : lo_end].strip()
        hi = sql[hi_start:hi_end].strip().rstrip(";")
        if not lo or not hi:
            raise ValueError("BETWEEN SYMMETRIC: empty bound")
        repl = (
            f"BETWEEN least({lo}, {hi}) AND greatest({lo}, {hi})"
        )
        sql = sql[: m.start()] + repl + " " + sql[hi_end:]


# ---------------------------------------------------------------------------
# PG split-to-rows SRFs: regexp_split_to_table / string_to_table
# (↔ PG string functions; the reference's regress suites use them for
# token fixtures). Neither name exists in Spark, so the rewrite is
# unconditional. Both positions PG allows are handled:
#
# - select list: the call becomes `explode(split(...))` inline
#   (Spark's generator-in-projection form);
# - FROM position: a LATERAL `(SELECT explode(split(...)) AS col)`
#   subquery, with PG's bare-alias-names-the-column rule, same as
#   pg_unnest.
#
# string_to_table splits on a LITERAL separator: its regex metachars
# are escaped at rewrite time (emitted backslashes doubled — Spark's
# literal parser consumes one level). A non-literal separator has no
# faithful Spark spelling (split() is regex-based) and is rejected
# loudly rather than silently mis-splitting.
_SPLIT_SRF = re.compile(
    r"\b(regexp_split_to_table|string_to_table)\s*\(", re.I
)

_REGEX_META = set(".^$*+?()[]{}|\\")


def _literal_to_regex(lit: str, fn: str = "string_to_table") -> str:
    """'sep' literal → Spark regex literal matching it verbatim.
    Each emitted level of escaping doubles: the regex needs ``\\<ch>``,
    and Spark's literal parser consumes one backslash level, so a
    metachar emits two backslashes — and a literal backslash SEPARATOR
    needs four (``\\\\`` in the statement text → ``\\`` after literal
    parsing → a backslash-matching regex)."""
    body = lit.strip()[1:-1].replace("''", "'")
    # cook C-style escapes exactly the way Spark's literal parser will
    # read the statement's data literals ('\\\\' is ONE backslash to
    # Spark) so separator and data agree on what a backslash is
    cooked, k = [], 0
    while k < len(body):
        if body[k] == "\\" and k + 1 < len(body):
            nxt = body[k + 1]
            if nxt not in "\\ntr":
                # Spark's literal parser has more escapes (\b, \Z,
                # octal, \uXXXX, \%/\_) with semantics this table
                # doesn't replicate — reject loudly rather than split
                # on the wrong character
                raise ValueError(
                    f"{fn}: unsupported escape \\{nxt} in "
                    "separator — use regexp_split_to_table"
                )
            cooked.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
            k += 2
        else:
            cooked.append(body[k])
            k += 1
    out = []
    for ch in cooked:
        if ch == "\\":
            out.append("\\\\\\\\")
        elif ch in _REGEX_META:
            out.append("\\\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        else:
            out.append(ch)
    return "'" + "".join(out).replace("'", "''") + "'"


def pg_split_to_table(sql: str) -> str:
    from citus_spark.plans.rewrites import _next_call

    m, i, spans = _next_call(sql, _SPLIT_SRF, 0)
    if m is None:
        return sql
    fn = m.group(1).lower()
    args = _split_top_level(sql[m.end() : i])
    if len(args) != 2:
        raise ValueError(
            f"{fn} expects 2 arguments here (the 3-argument null-string "
            f"form is not supported)"
        )
    src, sep = args[0].strip(), args[1].strip()
    if fn == "string_to_table":
        sep = _require_literal_sep("string_to_table", sep)
    if fn == "string_to_table" and sep == "''":
        # PG: an empty-string delimiter yields the whole input as ONE
        # field (Spark's split on an empty regex explodes per char)
        body = f"array({src})"
    else:
        body = f"split({src}, {sep}, -1)"
    if fn == "string_to_table":
        # PG: the empty input string yields ZERO rows (mirroring
        # string_to_array('', sep) = {}); Spark's split('') is ['']
        # which would explode to one empty row. The duplicated src is
        # merged by Spark's subexpression elimination (deterministic
        # exprs in one projection).
        arr = f"(CASE WHEN ({src}) = '' THEN array() ELSE {body} END)"
    else:
        arr = body
    rest = sql[i + 1 :]
    if _in_from_clause(sql, spans, m.start()):
        head = sql[: m.start()].rstrip()
        lateral = not re.search(r"\bFROM\s*$", head, re.I)
        col, alias = fn, ""
        am = re.match(
            r"\s*(?:AS\s+)?([A-Za-z_]\w*)(?:\s*\(\s*([A-Za-z_]\w*)\s*\))?",
            rest, re.I,
        )
        if am and am.group(1).upper() not in _KW_STOP:
            alias = f" {am.group(1)}"
            col = am.group(2) if am.group(2) else am.group(1)
            rest = rest[am.end() :]
        lat = "LATERAL " if lateral else ""
        out = (
            f"{sql[: m.start()]}{lat}(SELECT explode({arr}) AS {col})"
            f"{alias}{rest}"
        )
    else:
        out = f"{sql[: m.start()]}explode({arr}){rest}"
    return pg_split_to_table(out)


# ---------------------------------------------------------------------------
# string_to_array(s, 'sep') — the array-returning sibling of
# string_to_table (↔ reference regress multi_real_time_transaction.sql
# :323 uses it inside row-level-security policies). Spark's split() is
# regex-based, so the literal separator is escaped exactly as
# string_to_table's is (shared cooking); split(.., -1) keeps trailing
# empty fields like PG. PG's one divergent corner — the empty input
# string yields an EMPTY array, not [''] — is preserved with a CASE.
# Runtime separators and the 3-argument null-string form reject
# loudly.
_STRING_TO_ARRAY = re.compile(r"\bstring_to_array\s*\(", re.I)


def _require_literal_sep(fn: str, sep: str) -> str:
    """Shared separator validation + regex cooking for the
    string_to_table / string_to_array siblings. Returns the escaped
    Spark regex literal; raises on runtime separators (un-escapable)."""
    if not re.fullmatch(r"'(?:[^']|'')*'", sep):
        hint = (
            " — use regexp_split_to_table"
            if fn == "string_to_table"
            else ""
        )
        raise ValueError(
            f"{fn} requires a literal separator (Spark split() is "
            f"regex-based; a runtime separator cannot be escaped "
            f"safely){hint}"
        )
    return _literal_to_regex(sep, fn)


def pg_string_to_array(sql: str) -> str:
    from citus_spark.plans.rewrites import _next_call

    start = 0
    while True:
        m, i, _ = _next_call(sql, _STRING_TO_ARRAY, start)
        if m is None:
            return sql
        args = _split_top_level(sql[m.end() : i])
        if len(args) != 2:
            raise ValueError(
                "string_to_array expects 2 arguments here (the "
                "3-argument null-string form is not supported)"
            )
        src, sep = args[0].strip(), args[1].strip()
        sep = _require_literal_sep("string_to_array", sep)
        if sep == "''":
            # PG: an empty-string delimiter treats the whole input as
            # ONE field (Spark's split on an empty regex would explode
            # per character — silently wrong)
            repl = (
                f"(CASE WHEN ({src}) = '' THEN array() "
                f"ELSE array({src}) END)"
            )
        else:
            # the duplicated src is merged by Spark's subexpression
            # elimination (deterministic exprs in one projection)
            repl = (
                f"(CASE WHEN ({src}) = '' THEN array() "
                f"ELSE split({src}, {sep}, -1) END)"
            )
        sql = sql[: m.start()] + repl + sql[i + 1 :]
        # resume AT the replacement: src is copied into both CASE
        # branches and may itself contain string_to_array calls that
        # still need rewriting (the emitted text cannot re-match)
        start = m.start()


# ---------------------------------------------------------------------------
# array_to_string(arr, sep[, null_string]) — PG's name for Spark's
# array_join, argument-for-argument (both skip NULL elements in the
# 2-arg form; both substitute the third argument when given). A pure
# name alias: no argument surgery needed.
_ARRAY_TO_STRING = re.compile(r"\barray_to_string\s*\(", re.I)


def pg_array_to_string(sql: str) -> str:
    from citus_spark.plans.rewrites import _masked_spans

    out = []
    last = 0
    spans = _masked_spans(sql)
    for m in _ARRAY_TO_STRING.finditer(sql):
        if any(a <= m.start() < b for a, b in spans):
            continue
        out.append(sql[last : m.start()])
        out.append("array_join(")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


# ---------------------------------------------------------------------------
# PG array-function spellings with generic element types — SQL UDFs
# can't be generic, so these translate textually:
#   array_cat(a, b)        → concat(a, b)   (Spark concat is array-aware)
#   array_upper(a, 1)      → size(a)        (PG arrays are 1-based)
#   array_lower(a, 1)      → 1
#   array_fill(v, array(n)) → array_repeat(v, n)
# Higher dimensions reject loudly (the engine's arrays are 1-D, like
# the reference's distributed use of them).
def pg_array_compat(sql: str) -> str:
    sql = _map_code(
        sql,
        lambda c: re.sub(r"\barray_cat\s*\(", "concat(", c, flags=re.I),
    )
    for fn in ("array_upper", "array_lower"):
        pat = re.compile(rf"\b{fn}\s*\(", re.I)
        cursor = 0  # advance past each replacement — no O(n·k) rescan
        while True:
            found = _find_call_span(sql, pat, cursor)
            if found is None:
                break
            _t, open_idx, close_idx = found
            args = _split_top_level(sql[open_idx + 1 : close_idx])
            if len(args) != 2 or args[1].strip() != "1":
                raise NotImplementedError(
                    f"{fn}: only dimension 1 is supported "
                    "(engine arrays are one-dimensional)"
                )
            repl = (
                f"size({args[0].strip()})" if fn == "array_upper" else "1"
            )
            sql = sql[: _t.start()] + repl + sql[close_idx + 1 :]
            cursor = _t.start() + len(repl)
    pat = re.compile(r"\barray_fill\s*\(", re.I)
    cursor = 0
    while True:
        found = _find_call_span(sql, pat, cursor)
        if found is None:
            break
        _t, open_idx, close_idx = found
        args = _split_top_level(sql[open_idx + 1 : close_idx])
        dim = re.fullmatch(
            r"\s*array\s*\(\s*([^(),]+?)\s*\)\s*",
            args[1] if len(args) == 2 else "",
            re.I,
        )
        if dim is None:
            raise NotImplementedError(
                "array_fill: only the 1-D form "
                "array_fill(value, ARRAY[n]) is supported"
            )
        repl = f"array_repeat({args[0].strip()}, {dim.group(1)})"
        sql = sql[: _t.start()] + repl + sql[close_idx + 1 :]
        cursor = _t.start() + len(repl)
    return sql
