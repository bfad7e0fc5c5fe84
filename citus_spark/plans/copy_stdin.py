"""COPY .. FROM STDIN — the psql-dump replay surface.

↔ reference commands/multi_copy.c (the stdin path: psql sends the
COPY command, then streams data lines, then `\\.`). This engine's
front door is a statement string, so the statement IS the stream: a
here-doc-shaped statement carries its data lines inline after the
COPY head, terminated by a `\\.` line (exactly what `pg_dump` emits
and what replaying a dump through session.sql produces). The API
twin (DistributedSession.copy_from_stdin) takes any iterable of
lines / file handle / str.

Formats: PG's default TEXT format (tab-delimited, `\\N` null,
backslash escapes) and FORMAT csv. Data decodes on the coordinator —
the payload is bounded by statement size, like each chunk of a psql
stream; bulk loads at scale use the file-path COPY (parallel parse).
"""

from __future__ import annotations

import re

# head terminator: ';' (psql's send trigger), a bare newline before
# the first data line (PG accepts the head without a semicolon), or
# end-of-statement. [ \t]* instead of \s* so the newline that starts
# the payload is matched, not swallowed.
_HEAD = re.compile(
    r"^\s*COPY\s+(?P<table>[A-Za-z_][\w.]*)\s*"
    r"(?:\(\s*(?P<cols>[^)]*?)\s*\))?\s*FROM\s+STDIN"
    # [ \t]+ before WITH: the clause must sit on the head line — a
    # newline there starts DATA, and a first data line that happens
    # to read "WITH (..)" must not be eaten as options
    r"(?:[ \t]+WITH[ \t]*\(\s*(?P<opts>[^)]*)\))?[ \t]*(?:;|\n|$)",
    re.I,
)


def parse_copy_stdin(sql: str):
    """→ (table, cols|None, fmt, payload_lines|None) or None.
    payload is None when the statement carries no inline data (the
    API form supplies it separately)."""
    m = _HEAD.match(sql)
    if m is None:
        return None
    fmt = "text"
    for part in (m.group("opts") or "").split(","):
        part = part.strip()
        if not part:
            continue
        toks = part.split(None, 1)
        key = toks[0].lower()
        val = (
            toks[1].strip().strip("'\"").lower() if len(toks) > 1 else None
        )
        if key == "format":
            if val not in ("text", "csv"):
                raise ValueError(
                    f"COPY FROM STDIN: unsupported FORMAT {val!r} "
                    "(text/csv; use file-path COPY for jsonl/binary)"
                )
            fmt = val
        elif key == "header":
            raise ValueError(
                "COPY FROM STDIN: HEADER is not supported on the "
                "inline form (drop the header line from the payload)"
            )
        else:
            raise ValueError(f"COPY FROM STDIN: unknown option {key!r}")
    cols = None
    if m.group("cols"):
        cols = [c.strip() for c in m.group("cols").split(",")]
    rest = sql[m.end():]
    payload = None
    if rest.strip():
        lines = rest.split("\n")
        # drop the line-break artifact after a ';'-terminated head —
        # but when the head regex consumed the newline itself, the
        # first element is a REAL (possibly empty) data line
        head_text = sql[: m.end()]
        if (
            not head_text.endswith("\n")
            and lines
            and lines[0].strip() == ""
        ):
            lines = lines[1:]
        payload = []
        terminated = False
        for ln in lines:
            if ln.strip() == r"\.":
                terminated = True
                break
            payload.append(ln)
        if not terminated and payload and payload[-1].strip() == "":
            payload = payload[:-1]
    return m.group("table"), cols, fmt, payload


_UNESCAPE = {
    "\\": "\\",
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    "v": "\v",
}


def _unescape_text_field(field: str) -> str | None:
    if field == r"\N":
        return None
    out = []
    i = 0
    while i < len(field):
        c = field[i]
        if c == "\\" and i + 1 < len(field):
            out.append(_UNESCAPE.get(field[i + 1], field[i + 1]))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_csv_line(line: str) -> list[str | None]:
    """PG CSV field split: unquoted empty → NULL, quoted empty ("")
    → the empty string, doubled quote escapes inside quotes. Python's
    csv.reader collapses the quoted/unquoted distinction, which IS
    the NULL marker in PG's dialect, so split by hand."""
    fields: list[str | None] = []
    buf: list[str] = []
    quoted = False  # current field ever entered quotes
    in_q = False
    i = 0
    while i < len(line):
        c = line[i]
        if in_q:
            if c == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    buf.append('"')
                    i += 2
                    continue
                in_q = False
            else:
                buf.append(c)
        elif c == '"':
            in_q = True
            quoted = True
        elif c == ",":
            fields.append(
                "".join(buf) if (buf or quoted) else None
            )
            buf = []
            quoted = False
        else:
            buf.append(c)
        i += 1
    if in_q:
        raise ValueError(
            f"COPY FROM STDIN: unterminated quoted CSV field: {line!r}"
        )
    fields.append("".join(buf) if (buf or quoted) else None)
    return fields


def decode_payload(
    lines: list[str], fmt: str, n_cols: int
) -> list[list[str | None]]:
    """Data lines → rows of string-or-None fields, validated against
    the expected column count (PG rejects ragged rows outright).
    An empty line is ONE empty-string field — a legal row for a
    single-column table, a 'missing data for column' error otherwise
    (PG never silently skips lines)."""
    rows: list[list[str | None]] = []
    if fmt == "csv":
        # reassemble logical records first: PG CSV accepts embedded
        # newlines inside quoted fields, so a physical line with an
        # odd quote count leaves its record open (doubled-quote
        # escapes add two quotes and keep parity). psql's own \.
        # terminator scan is line-based too, so the terminator
        # handling upstream matches PG's behavior.
        records: list[str] = []
        buf: str | None = None
        for ln in lines:
            buf = ln if buf is None else f"{buf}\n{ln}"
            if buf.count('"') % 2 == 0:
                records.append(buf)
                buf = None
        if buf is not None:
            records.append(buf)  # unterminated — splitter errors
        for rec in records:
            rows.append(_split_csv_line(rec))
    else:
        for ln in lines:
            rows.append([
                _unescape_text_field(f) for f in ln.split("\t")
            ])
    for r in rows:
        if len(r) != n_cols:
            raise ValueError(
                f"COPY FROM STDIN: row has {len(r)} fields, "
                f"expected {n_cols} "
                "(PG: missing/extra data for column)"
                f": {r!r}"
            )
    return rows
