"""Textual MERGE INTO — the SQL front door for the merge operator.

↔ reference MERGE (planner/merge_planner.c:115 CreateMergePlan): the
reference exposes MERGE as a SQL statement and plans its data movement
(pushdown / repartition / pull) underneath. Here the statement parses
into a call to sources.ingest.merge_into, whose single join Catalyst
plans with the same three outcomes (co-partitioned = no shuffle,
else shuffle; broadcast when small).

Supported grammar (the analytical whole-row subset):

    MERGE INTO <target> [[AS] t]
    USING <source-table | (subquery) [[AS] s]>
    ON <t.k1 = s.k1 [AND t.k2 = s.k2 ...]>
    [WHEN MATCHED THEN UPDATE SET *]
    [WHEN MATCHED THEN DELETE]
    [WHEN NOT MATCHED THEN INSERT *]

The ON clause must be an equi-conjunction over same-named columns
(the reference, too, requires the distribution key in the join — its
repartition strategy exists precisely because arbitrary ON clauses
don't route); anything else raises with a clear message rather than
silently mis-merging.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class MergeStatement:
    target: str
    source: str  # table name, or the parenthesized subquery text
    source_is_subquery: bool
    keys: list[str]
    when_matched: str  # "update" | "delete" | "ignore"
    insert_unmatched: bool


_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+",
    re.I,
)
_ON = re.compile(
    r"\s*(?:\s+AS)?(?:\s+(?P<salias>[A-Za-z_]\w*))?\s+ON\s+(?P<rest>.+)$",
    re.I | re.S,
)
_WHEN = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)",
    re.I,
)


def _split_source(text: str) -> tuple[str, bool, str]:
    """Return (source, is_subquery, remainder-after-source)."""
    text = text.lstrip()
    if text.startswith("("):
        depth = 0
        for i, ch in enumerate(text):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return text[1:i], True, text[i + 1 :]
        raise ValueError("MERGE: unbalanced parentheses in USING subquery")
    m = re.match(r"([A-Za-z_][\w.]*)", text)
    if not m:
        raise ValueError(f"MERGE: cannot parse USING source near {text[:40]!r}")
    return m.group(1), False, text[m.end() :]


def _keys_from_on(cond: str) -> list[str]:
    """Equi-conjunction over same-named columns → key list."""
    keys = []
    for part in re.split(r"\s+AND\s+", cond.strip(), flags=re.I):
        m = re.match(
            r"^\s*(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*=\s*"
            r"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*$",
            part,
        )
        if not m or m.group(1).lower() != m.group(2).lower():
            raise NotImplementedError(
                "MERGE ON must be an equi-conjunction over same-named "
                f"columns (t.k = s.k AND ...); got {part.strip()!r}"
            )
        keys.append(m.group(1))
    return keys


def parse_merge(sql: str) -> MergeStatement:
    head = _HEAD.match(sql)
    if not head:
        raise ValueError("not a MERGE INTO statement")
    source, is_sub, rest = _split_source(sql[head.end() :])
    on = _ON.match(rest)
    if not on:
        raise ValueError("MERGE: missing ON clause")
    rest = on.group("rest")
    first_when = re.search(r"\bWHEN\b", rest, re.I)
    if not first_when:
        raise ValueError("MERGE: needs at least one WHEN clause")
    keys = _keys_from_on(rest[: first_when.start()])

    when_matched = "ignore"
    insert_unmatched = False
    for m in _WHEN.finditer(rest[first_when.start() :]):
        action = re.sub(r"\s+", " ", m.group("action")).upper()
        if m.group("not"):
            if action != "INSERT *":
                raise NotImplementedError(
                    f"MERGE: WHEN NOT MATCHED supports INSERT *; got {action}"
                )
            insert_unmatched = True
        elif action == "UPDATE SET *":
            when_matched = "update"
        elif action == "DELETE":
            when_matched = "delete"
    return MergeStatement(
        target=head.group("target"),
        source=source,
        source_is_subquery=is_sub,
        keys=keys,
        when_matched=when_matched,
        insert_unmatched=insert_unmatched,
    )


def is_merge(sql: str) -> bool:
    return bool(re.match(r"^\s*MERGE\b", sql, re.I))
