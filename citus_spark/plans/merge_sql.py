"""Textual MERGE INTO — the SQL front door for the merge operator.

↔ reference MERGE (planner/merge_planner.c:115 CreateMergePlan): the
reference exposes MERGE as a SQL statement and plans its data movement
(pushdown / repartition / pull) underneath. Here the statement parses
into a call to the merge executor (sources.ingest.merge_into for the
whole-row form, sources.ingest.merge_apply for the general form),
whose single join Catalyst plans with the same three outcomes
(co-partitioned = no shuffle, else shuffle; broadcast when small).

Supported grammar:

    MERGE INTO <target> [[AS] t]
    USING <source-table | (subquery) [[AS] s]>
    ON <t.k1 = s.k1 [AND t.k2 = s.k2 ...]>
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = expr, ...]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED THEN INSERT * | INSERT (cols) VALUES (exprs)]

The ON clause must be an equi-conjunction over same-named columns
(the reference, too, requires the distribution key in the join — its
repartition strategy exists precisely because arbitrary ON clauses
don't route). Assignment/condition/value expressions reference the
two sides as `t.` and `s.` (or the declared aliases, normalized to
t/s at parse time); anything unsupported raises with a clear message
rather than silently mis-merging.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class MergeStatement:
    target: str
    source: str  # table name, or the parenthesized subquery text
    source_is_subquery: bool
    keys: list[str]
    when_matched: str  # "update" | "delete" | "ignore"
    insert_unmatched: bool
    # general-form extensions (None/empty = whole-row semantics)
    assignments: list[tuple[str, str]] = field(default_factory=list)
    matched_condition: str | None = None
    insert_cols: list[str] = field(default_factory=list)
    insert_values: list[str] = field(default_factory=list)
    returning: str | None = None  # PG 17 MERGE .. RETURNING

    @property
    def is_whole_row(self) -> bool:
        return (
            not self.assignments
            and self.matched_condition is None
            and not self.insert_cols
        )


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
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.*?|DELETE|INSERT\s*\*"
    r"|INSERT\s*\([^)]*\)\s*VALUES\s*\(.*?\))"
    # anchor on the next WHEN [NOT] MATCHED clause, NOT a bare WHEN —
    # assignment expressions legitimately contain CASE WHEN ... THEN
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*;?\s*$)",
    re.I | re.S,
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


def _split_assignments(text: str) -> list[tuple[str, str]]:
    """'c1 = expr1, c2 = expr2' → [(c1, expr1), ...] (top-level
    commas only, string-literal aware)."""
    from citus_spark.plans.rewrites import _split_top_level

    out = []
    for p in _split_top_level(text):
        m = re.match(
            r"^\s*(?:t\.)?([A-Za-z_]\w*)\s*=\s*(.+?)\s*$", p, re.S
        )
        if not m:
            raise ValueError(f"MERGE: cannot parse assignment {p.strip()!r}")
        out.append((m.group(1), m.group(2)))
    return out


def _normalize_aliases(text: str, talias: str | None, salias: str | None) -> str:
    """Rewrite user-declared aliases to the canonical t./s. prefixes —
    in ONE simultaneous case-insensitive pass, so swapped aliases
    (target AS s, source AS t) cannot cross-wire mid-rewrite."""
    mapping = {}
    if talias:
        mapping[talias.lower()] = "t"
    if salias:
        mapping[salias.lower()] = "s"
    if not mapping:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in mapping) + r")\.",
        re.IGNORECASE,
    )
    return pat.sub(lambda m: mapping[m.group(1).lower()] + ".", text)


def parse_merge(sql: str) -> MergeStatement:
    from citus_spark.plans.dml_sql import split_returning

    sql, returning = split_returning(sql)
    head = _HEAD.match(sql)
    if not head:
        raise ValueError("not a MERGE INTO statement")
    source, is_sub, rest = _split_source(sql[head.end() :])
    on = _ON.match(rest)
    if not on:
        raise ValueError("MERGE: missing ON clause")
    rest = _normalize_aliases(
        on.group("rest"), head.group("talias"), on.group("salias")
    )
    first_when = re.search(r"\bWHEN\b", rest, re.I)
    if not first_when:
        raise ValueError("MERGE: needs at least one WHEN clause")
    keys = _keys_from_on(rest[: first_when.start()])

    when_matched = "ignore"
    insert_unmatched = False
    assignments: list[tuple[str, str]] = []
    matched_condition: str | None = None
    insert_cols: list[str] = []
    insert_values: list[str] = []
    for m in _WHEN.finditer(rest[first_when.start() :]):
        action = m.group("action").strip()
        action_u = re.sub(r"\s+", " ", action).upper()
        if m.group("not"):
            if m.group("cond"):
                raise NotImplementedError(
                    "MERGE: WHEN NOT MATCHED AND <cond> is unsupported"
                )
            if action_u == "INSERT *":
                insert_unmatched = True
            elif action_u.startswith("INSERT"):
                im = re.match(
                    r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$",
                    action, re.I | re.S,
                )
                if not im:
                    raise NotImplementedError(
                        f"MERGE: cannot parse NOT MATCHED action {action!r}"
                    )
                insert_unmatched = True
                insert_cols = [
                    c.strip() for c in im.group(1).split(",") if c.strip()
                ]
                from citus_spark.plans.rewrites import _split_top_level

                insert_values = _split_top_level(im.group(2))
                if len(insert_cols) != len(insert_values):
                    raise ValueError(
                        "MERGE: INSERT column/value count mismatch"
                    )
            else:
                raise NotImplementedError(
                    f"MERGE: WHEN NOT MATCHED supports INSERT; got {action_u}"
                )
        else:
            if when_matched != "ignore":
                # collapsing several WHEN MATCHED branches into one
                # action/condition pair would execute the WRONG merge
                # — reject rather than silently corrupt
                raise NotImplementedError(
                    "MERGE: only one WHEN MATCHED branch is supported"
                )
            if m.group("cond"):
                matched_condition = m.group("cond").strip()
            if action_u == "UPDATE SET *":
                when_matched = "update"
            elif action_u.startswith("UPDATE SET"):
                when_matched = "update"
                assignments = _split_assignments(
                    re.sub(r"^UPDATE\s+SET\s+", "", action,
                           flags=re.I | re.S)
                )
            elif action_u == "DELETE":
                when_matched = "delete"
    return MergeStatement(
        target=head.group("target"),
        source=source,
        source_is_subquery=is_sub,
        keys=keys,
        when_matched=when_matched,
        insert_unmatched=insert_unmatched,
        assignments=assignments,
        matched_condition=matched_condition,
        insert_cols=insert_cols,
        insert_values=insert_values,
        returning=returning,
    )


def is_merge(sql: str) -> bool:
    return bool(re.match(r"^\s*MERGE\b", sql, re.I))
