"""Textual COPY — the reference's bulk-ingest front door.

↔ reference COPY (commands/multi_copy.c — SURVEY §3.3: COPY FROM
parses on the coordinator and streams rows to shards by hash; COPY
(query) TO streams results out). Spark-first translation: COPY FROM
is a parallel file parse appended to the target's storage (the hash
route is the target's bucketing); COPY TO is a distributed write of
the relation/query. Grammar (PostgreSQL spelling):

    COPY <table> FROM '<path>' [WITH (FORMAT csv|jsonl|binary [, HEADER [bool]])]
    COPY <table> TO '<path>'   [WITH (...)]
    COPY (SELECT ...) TO '<path>' [WITH (...)]

FORMAT binary speaks the PG binary COPY wire format
(plans/copy_binary.py). HEADER defaults OFF, matching PostgreSQL — scripts that never mention
HEADER move headerless files, byte-compatible with psql's output.
Returns the psql-style `COPY <n>` row count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class CopyStatement:
    direction: str  # "from" | "to"
    table: str | None  # None when copying a query
    query: str | None  # the SELECT text for COPY (query) TO
    path: str
    fmt: str  # "csv" | "jsonl" | "binary"
    header: bool


_PREFIX = re.compile(r"^\s*COPY\s+", re.I)
_FROM_TO = re.compile(
    r"\s+(FROM|TO)\s+'(?P<path>[^']+)'"
    r"(?:\s+WITH\s*\(\s*(?P<opts>[^)]*)\))?\s*;?\s*$",
    re.I,
)


def is_copy(sql: str) -> bool:
    return bool(_PREFIX.match(sql)) and bool(_FROM_TO.search(sql))


def _parse_options(opts: str | None) -> tuple[str, bool]:
    # PostgreSQL's COPY defaults: csv format option given, HEADER OFF —
    # a headerless psql-produced file must round-trip losslessly
    fmt, header = "csv", False
    for part in (opts or "").split(","):
        part = part.strip()
        if not part:
            continue
        toks = part.split(None, 1)
        key = toks[0].lower()
        val = toks[1].strip().strip("'\"").lower() if len(toks) > 1 else None
        if key == "format":
            if val not in ("csv", "jsonl", "json", "binary"):
                raise ValueError(f"COPY: unsupported FORMAT {val!r}")
            fmt = {"jsonl": "jsonl", "json": "jsonl"}.get(val, val)
        elif key == "header":
            header = val in (None, "true", "on", "1")
        else:
            raise ValueError(f"COPY: unknown option {key!r}")
    return fmt, header


def parse_copy(sql: str) -> CopyStatement | None:
    m = _PREFIX.match(sql)
    tail = _FROM_TO.search(sql)
    if not (m and tail):
        return None
    head = sql[m.end() : tail.start()].strip()
    fmt, header = _parse_options(tail.group("opts"))
    direction = tail.group(1).lower()
    if head.startswith("("):
        if not head.endswith(")"):
            raise ValueError("COPY: unbalanced parentheses around query")
        if direction == "from":
            raise ValueError("COPY (query) only supports TO")
        return CopyStatement(
            direction, None, head[1:-1].strip(), tail.group("path"), fmt,
            header,
        )
    if not re.match(r"^[A-Za-z_][\w.]*$", head):
        raise ValueError(f"COPY: cannot parse relation {head!r}")
    return CopyStatement(
        direction, head, None, tail.group("path"), fmt, header
    )
