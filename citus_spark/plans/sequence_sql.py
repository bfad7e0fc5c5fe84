"""Sequences — CREATE SEQUENCE / nextval / currval / setval and the
serial / GENERATED AS IDENTITY column sugar.

↔ reference src/test/regress/sql/sequences.sql,
multi_sequence_default.sql, generated_identity.sql. Citus gives every
worker a disjoint chunk of the sequence space (coordinator allocates
ranges; values are UNIQUE but not gapless or contiguous across nodes).
The Spark analog here is per-STATEMENT block allocation: the
coordinator (driver) reserves exactly the number of values a
statement needs and a two-phase distributed prefix sum hands each row
its offset — unique AND contiguous within the statement, the stronger
guarantee, with only a per-partition-count collect driver-side.

Parsing only in this module; execution lives in the session (the
sequence state is session catalog state, like the reference's
coordinator-owned sequence relation).
"""

from __future__ import annotations

import re

_CREATE_SEQ = re.compile(
    r"^\s*CREATE\s+SEQUENCE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?P<opts>[^;]*?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_SEQ = re.compile(
    r"^\s*DROP\s+SEQUENCE\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
    re.I,
)
_ALTER_SEQ = re.compile(
    r"^\s*ALTER\s+SEQUENCE\s+(?:IF\s+EXISTS\s+)?(?P<name>[A-Za-z_][\w.]*)"
    r"\s+(?P<opts>.+?)\s*;?\s*$",
    re.I | re.S,
)

# nextval('seq') / nextval('seq'::regclass) — the literal name form
# the regress scripts use (a computed sequence name would need
# runtime resolution; rejected loudly where it matters)
NEXTVAL = re.compile(
    r"\bnextval\s*\(\s*'(?P<seq>[^']+)'\s*(?:::\s*regclass)?\s*\)", re.I
)
CURRVAL = re.compile(
    r"\bcurrval\s*\(\s*'(?P<seq>[^']+)'\s*(?:::\s*regclass)?\s*\)", re.I
)
SETVAL = re.compile(
    r"\bsetval\s*\(\s*'(?P<seq>[^']+)'\s*(?:::\s*regclass)?\s*,\s*"
    r"(?P<n>\d+)\s*(?:,\s*(?P<called>true|false)\s*)?\)",
    re.I,
)


_SEQ_OPT = re.compile(
    r"(?:AS\s+(?P<astype>smallint|int(?:eger)?|bigint)"
    r"|START\s+(?:WITH\s+)?(?P<start>-?\d+)"
    r"|INCREMENT\s+(?:BY\s+)?(?P<inc>-?\d+)"
    r"|MINVALUE\s+(?P<min>-?\d+)|(?P<nomin>NO\s+MINVALUE)"
    r"|MAXVALUE\s+(?P<max>-?\d+)|(?P<nomax>NO\s+MAXVALUE)"
    r"|CACHE\s+\d+"  # advisory: block allocation IS the cache
    r"|(?P<nocycle>NO\s+CYCLE)|(?P<cycle>CYCLE)"
    # PG grammar: RESTART [ [ WITH ] restart ] — WITH is optional
    r"|(?P<restart>RESTART)(?:\s+(?:WITH\s+)?(?P<restart_n>-?\d+))?"
    r"|OWNED\s+BY\s+(?:NONE|[A-Za-z_][\w.]*)"  # advisory
    r")\s*",
    re.I,
)

PG_SEQ_MAX = 2**63 - 1
PG_SEQ_MIN = -(2**63 - 1)

# PG: the sequence's data type bounds its value range
_TYPE_BOUNDS = {
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "integer": (-(2**31), 2**31 - 1),
    "bigint": (PG_SEQ_MIN, PG_SEQ_MAX),
}


def parse_seq_options(opts: str) -> dict:
    """PG sequence option list → {start, inc, min, max, cycle,
    restart}. Unset keys are absent; NO MINVALUE/MAXVALUE appear as
    None values. Any unrecognized token raises — a sequence change
    must never be silently ignored."""
    out: dict = {}
    pos, s = 0, opts.strip()
    while pos < len(s):
        m = _SEQ_OPT.match(s, pos)
        if m is None:
            raise NotImplementedError(
                f"ALTER/CREATE SEQUENCE: unsupported option near "
                f"{s[pos:pos + 40]!r}"
            )
        if m.group("astype") is not None:
            out["astype"] = m.group("astype").lower()
        if m.group("start") is not None:
            out["start"] = int(m.group("start"))
        if m.group("inc") is not None:
            out["inc"] = int(m.group("inc"))
            if out["inc"] == 0:
                raise ValueError("INCREMENT must not be zero")
        if m.group("min") is not None:
            out["min"] = int(m.group("min"))
        if m.group("nomin"):
            out["min"] = None
        if m.group("max") is not None:
            out["max"] = int(m.group("max"))
        if m.group("nomax"):
            out["max"] = None
        if m.group("cycle"):
            out["cycle"] = True
        if m.group("nocycle"):
            out["cycle"] = False
        if m.group("restart"):
            out["restart"] = (
                int(m.group("restart_n"))
                if m.group("restart_n") is not None
                else "start"
            )
        pos = m.end()
    return out


def parse_create_sequence(sql: str):
    """→ (name, options-dict, if_not_exists) or None."""
    m = _CREATE_SEQ.match(sql)
    if m is None:
        return None
    opts = parse_seq_options(m.group("opts") or "")
    if "restart" in opts:
        raise ValueError("RESTART is an ALTER SEQUENCE action")
    return m.group("name"), opts, bool(m.group("ine"))


def parse_drop_sequence(sql: str):
    m = _DROP_SEQ.match(sql)
    if m is None:
        return None
    return m.group("name"), bool(m.group("ine"))


def parse_alter_sequence(sql: str):
    """→ (name, options-dict) — RESTART [WITH n], INCREMENT BY,
    MIN/MAXVALUE, CYCLE/NO CYCLE, START WITH (changes the remembered
    start without moving the counter, PG semantics), advisory
    CACHE/OWNED BY/AS."""
    m = _ALTER_SEQ.match(sql)
    if m is None:
        return None
    return m.group("name"), parse_seq_options(m.group("opts"))


def seq_defaults(opts: dict) -> dict:
    """Resolve a CREATE SEQUENCE option dict into full state with PG
    defaults: ascending sequences run [1, type-max] starting at min;
    descending run [type-min, -1] starting at max. AS <type> (PG: the
    sequence's data type) supplies the bounds when MIN/MAXVALUE are
    not explicit."""
    inc = opts.get("inc", 1)
    tmin, tmax = _TYPE_BOUNDS[opts.get("astype", "bigint")]
    mn = opts.get("min")
    mx = opts.get("max")
    if mn is None:
        mn = 1 if inc > 0 else tmin
    if mx is None:
        mx = tmax if inc > 0 else -1
    if not (tmin <= mn and mx <= tmax):
        raise ValueError(
            f"MINVALUE/MAXVALUE ({mn}, {mx}) out of range for "
            f"sequence type {opts.get('astype', 'bigint')}"
        )
    start = opts.get("start", mn if inc > 0 else mx)
    if not mn <= start <= mx:
        raise ValueError(
            f"START value ({start}) cannot be outside "
            f"[{mn}, {mx}]"
        )
    return {
        "next": start,
        "inc": inc,
        "last": None,
        "start": start,
        "min": mn,
        "max": mx,
        "cycle": bool(opts.get("cycle", False)),
        "astype": opts.get("astype", "bigint"),
    }


# serial / identity column sugar in CREATE TABLE items
_SERIAL_COL = re.compile(
    r"^([A-Za-z_]\w*)\s+(small|big)?serial\b", re.I
)
_IDENTITY_COL = re.compile(
    r"^([A-Za-z_]\w*)\s+.+?\bGENERATED\s+(?:ALWAYS|BY\s+DEFAULT)\s+AS\s+"
    r"IDENTITY\b(?:\s*\(([^)]*)\))?",
    re.I | re.S,
)
_DEFAULT_NEXTVAL = re.compile(
    r"^([A-Za-z_]\w*)\s+.+?\bDEFAULT\s+nextval\s*\(\s*'([^']+)'",
    re.I | re.S,
)


def identity_of(column_item: str):
    """If a CREATE TABLE column item declares an auto-sequence
    (serial/bigserial, GENERATED .. AS IDENTITY [(opts)], DEFAULT
    nextval), return (column, explicit_seq_name_or_None, opts_dict)
    where opts_dict feeds :func:`seq_defaults`. IDENTITY options go
    through the full parse_seq_options grammar — MIN/MAXVALUE/CYCLE
    inside the parens are honored, never silently dropped. An explicit
    name (DEFAULT nextval) means the sequence is NOT owned by the
    table — it survives DROP TABLE, like PG."""
    m = _SERIAL_COL.match(column_item)
    if m:
        # PG: smallserial/serial/bigserial take the type's bounds
        astype = {
            "small": "smallint", "big": "bigint", None: "int"
        }[m.group(2).lower() if m.group(2) else None]
        return m.group(1), None, {"astype": astype}
    m = _IDENTITY_COL.match(column_item)
    if m:
        return m.group(1), None, parse_seq_options(m.group(2) or "")
    m = _DEFAULT_NEXTVAL.match(column_item)
    if m:
        return m.group(1), m.group(2), {}
    return None
