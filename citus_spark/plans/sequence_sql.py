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


def parse_create_sequence(sql: str):
    """→ (name, start, increment, if_not_exists) or None."""
    m = _CREATE_SEQ.match(sql)
    if m is None:
        return None
    opts = m.group("opts") or ""
    sm = re.search(r"\bSTART\s+(?:WITH\s+)?(-?\d+)", opts, re.I)
    im = re.search(r"\bINCREMENT\s+(?:BY\s+)?(-?\d+)", opts, re.I)
    inc = int(im.group(1)) if im else 1
    if inc == 0:
        raise ValueError("INCREMENT must not be zero")
    start = int(sm.group(1)) if sm else (1 if inc > 0 else -1)
    return m.group("name"), start, inc, bool(m.group("ine"))


def parse_drop_sequence(sql: str):
    m = _DROP_SEQ.match(sql)
    if m is None:
        return None
    return m.group("name"), bool(m.group("ine"))


def parse_alter_sequence(sql: str):
    """→ (name, new_start|None) for RESTART [WITH n]; other actions
    raise (never silently ignore a sequence change)."""
    m = _ALTER_SEQ.match(sql)
    if m is None:
        return None
    rm = re.match(
        r"RESTART(?:\s+WITH\s+(-?\d+))?\s*$", m.group("opts").strip(), re.I
    )
    if rm:
        return m.group("name"), (int(rm.group(1)) if rm.group(1) else None)
    om = re.match(r"OWNED\s+BY\b", m.group("opts").strip(), re.I)
    if om:
        return m.group("name"), "owned_by"  # advisory no-op
    raise NotImplementedError(
        f"ALTER SEQUENCE: unsupported action {m.group('opts')[:60]!r} "
        "(supported: RESTART [WITH n], OWNED BY)"
    )


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
    nextval), return (column, explicit_seq_name_or_None, start, inc).
    An explicit name (DEFAULT nextval) means the sequence is NOT
    owned by the table — it survives DROP TABLE, like PG."""
    m = _SERIAL_COL.match(column_item)
    if m:
        return m.group(1), None, 1, 1
    m = _IDENTITY_COL.match(column_item)
    if m:
        opts = m.group(2) or ""
        sm = re.search(r"\bSTART\s+(?:WITH\s+)?(-?\d+)", opts, re.I)
        im = re.search(r"\bINCREMENT\s+(?:BY\s+)?(-?\d+)", opts, re.I)
        inc = int(im.group(1)) if im else 1
        start = int(sm.group(1)) if sm else (1 if inc > 0 else -1)
        return m.group(1), None, start, inc
    m = _DEFAULT_NEXTVAL.match(column_item)
    if m:
        return m.group(1), m.group(2), 1, 1
    return None
