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
    [WHEN MATCHED [AND <cond>] THEN
        UPDATE SET * | UPDATE SET c = expr, ... | DELETE | DO NOTHING]...
    [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
        INSERT * | INSERT (cols) VALUES (exprs) | DO NOTHING]...
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
        UPDATE SET c = expr, ... | DELETE | DO NOTHING]...

Branches repeat and evaluate in statement order, first-true-wins —
the full PG grammar incl. PG 17's WHEN NOT MATCHED BY SOURCE (the
"sync two tables" idiom: upsert matches, delete leftovers). A branch
after an unconditional branch of the same kind is rejected as
unreachable, matching PG.

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
    # full branch lists (statement order, first-true-wins — the
    # complete PG WHEN grammar; the legacy fields above mirror the
    # single-branch statements for the whole-row fast path)
    #   matched:   (cond|None, "update"|"delete"|"nothing", assignments)
    #   not_matched (BY TARGET): (cond|None, cols, values)
    #       cols == []   → INSERT *
    #       cols is None → DO NOTHING
    #   by_source (PG 17): (cond|None, "update"|"delete"|"nothing",
    #                       assignments)
    matched_branches: list = field(default_factory=list)
    not_matched_branches: list = field(default_factory=list)
    by_source_branches: list = field(default_factory=list)

    @property
    def is_multi(self) -> bool:
        """True when the statement needs the multi-branch executor:
        several branches, guards on NOT MATCHED, DO NOTHING, or any
        BY SOURCE branch."""
        return bool(
            len(self.matched_branches) > 1
            or len(self.not_matched_branches) > 1
            or self.by_source_branches
            or any(a == "nothing" for _c, a, _g in self.matched_branches)
            or any(
                c is not None or cols is None
                for c, cols, _v in self.not_matched_branches
            )
        )

    @property
    def is_whole_row(self) -> bool:
        # positional INSERT VALUES (insert_values non-empty) and
        # INSERT DEFAULT VALUES (insert_values None) are NOT the
        # whole-source-row fast path — their values are expressions
        # over defaults/source, not the source row itself
        return (
            not self.assignments
            and self.matched_condition is None
            and not self.insert_cols
            and self.insert_values == []
            and not self.is_multi
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
    r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.*?|DELETE|DO\s+NOTHING|INSERT\s*\*"
    r"|INSERT\s+DEFAULT\s+VALUES"
    r"|INSERT\s*(?:\([^)]*\)\s*)?VALUES\s*\(.*?\))"
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


def _normalize_aliases(
    text: str,
    talias: str | None,
    salias: str | None,
    tname: str | None = None,
    sname: str | None = None,
) -> str:
    """Rewrite user-declared aliases to the canonical t./s. prefixes —
    in ONE simultaneous case-insensitive pass, so swapped aliases
    (target AS s, source AS t) cannot cross-wire mid-rewrite. A side
    declared WITHOUT an alias is addressable by its bare table name
    (PG semantics — `USING src ON t.id = src.id`), so the table name
    maps too; once aliased, PG itself forbids the bare name, so the
    alias wins and the name is left alone."""
    mapping = {}
    if talias:
        mapping[talias.lower()] = "t"
    elif tname:
        mapping[tname.split(".")[-1].lower()] = "t"
    if salias:
        mapping[salias.lower()] = "s"
    elif sname:
        mapping[sname.split(".")[-1].lower()] = "s"
    if not mapping:
        return text
    from citus_spark.plans.rewrites import _masked_spans

    spans = _masked_spans(text)
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in mapping) + r")\.",
        re.IGNORECASE,
    )

    def repl(m: re.Match) -> str:
        # never rewrite inside string literals — 'from logs.err' is
        # DATA even when logs is the target table
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)
        return mapping[m.group(1).lower()] + "."

    return pat.sub(repl, text)


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
        on.group("rest"),
        head.group("talias"),
        on.group("salias"),
        tname=head.group("target"),
        sname=None if is_sub else source,
    )
    first_when = re.search(r"\bWHEN\b", rest, re.I)
    if not first_when:
        raise ValueError("MERGE: needs at least one WHEN clause")
    keys = _keys_from_on(rest[: first_when.start()])

    matched_branches: list = []
    not_matched_branches: list = []
    by_source_branches: list = []

    def parse_update_or_delete(action: str, action_u: str):
        if action_u == "UPDATE SET *":
            return ("update", [])
        if action_u.startswith("UPDATE SET"):
            return (
                "update",
                _split_assignments(
                    re.sub(r"^UPDATE\s+SET\s+", "", action,
                           flags=re.I | re.S)
                ),
            )
        if action_u == "DELETE":
            return ("delete", [])
        if action_u == "DO NOTHING":
            return ("nothing", [])
        return None

    def check_reachable(branches, kind: str):
        # PG rejects a branch that follows an unconditional branch of
        # the same kind — first-true-wins makes it dead code, and a
        # silently dead MERGE action is worse than an error
        if branches and branches[-1][0] is None:
            raise ValueError(
                f"MERGE: unreachable {kind} clause — an unconditional "
                "branch of the same kind precedes it"
            )

    when_text = rest[first_when.start() :]
    covered_to = 0
    for m in _WHEN.finditer(when_text):
        if when_text[covered_to : m.start()].strip():
            # a WHEN clause the action grammar didn't recognize must
            # ERROR — finditer would otherwise skip it and the branch
            # would silently vanish from the statement
            raise NotImplementedError(
                "MERGE: cannot parse clause "
                f"{when_text[covered_to:m.start()].strip()[:80]!r}"
            )
        covered_to = m.end()
        action = m.group("action").strip()
        action_u = re.sub(r"\s+", " ", action).upper()
        cond = m.group("cond").strip() if m.group("cond") else None
        by = (m.group("by") or "").upper()
        if by and not m.group("not"):
            raise ValueError(
                "MERGE: BY SOURCE/BY TARGET applies to WHEN NOT MATCHED"
            )
        if m.group("not") and by == "SOURCE":
            # PG 17: target rows with no source match
            check_reachable(by_source_branches, "WHEN NOT MATCHED BY SOURCE")
            br = parse_update_or_delete(action, action_u)
            if br is None or (br[0] == "update" and not br[1]):
                raise NotImplementedError(
                    "MERGE: WHEN NOT MATCHED BY SOURCE supports UPDATE "
                    "SET col = expr / DELETE / DO NOTHING; got "
                    f"{action_u[:40]!r}"
                )
            by_source_branches.append((cond, *br))
        elif m.group("not"):
            check_reachable(not_matched_branches, "WHEN NOT MATCHED")
            if action_u == "DO NOTHING":
                not_matched_branches.append((cond, None, []))
            elif action_u == "INSERT *":
                not_matched_branches.append((cond, [], []))
            elif re.fullmatch(
                r"INSERT\s+DEFAULT\s+VALUES", action_u, re.I
            ):
                # every column takes its declared default (NULL when
                # none) — encoded as ([], None) for the executor
                not_matched_branches.append((cond, [], None))
            elif action_u.startswith("INSERT"):
                im = re.match(
                    r"INSERT\s*(?:\(([^)]*)\)\s*)?VALUES\s*\((.*)\)\s*$",
                    action, re.I | re.S,
                )
                if not im:
                    raise NotImplementedError(
                        f"MERGE: cannot parse NOT MATCHED action {action!r}"
                    )
                cols = [
                    c.strip()
                    for c in (im.group(1) or "").split(",")
                    if c.strip()
                ]
                from citus_spark.plans.rewrites import _split_top_level

                values = [
                    v for v in _split_top_level(im.group(2)) if v.strip()
                ]
                if not values:
                    raise ValueError(
                        "MERGE: INSERT VALUES () is empty "
                        "(PG syntax error)"
                    )
                if cols and len(cols) != len(values):
                    raise ValueError(
                        "MERGE: INSERT column/value count mismatch"
                    )
                # no column list (PG): values map to the target's
                # leading columns in declared order — ([], values)
                not_matched_branches.append((cond, cols, values))
            else:
                raise NotImplementedError(
                    "MERGE: WHEN NOT MATCHED supports INSERT / DO "
                    f"NOTHING; got {action_u[:40]!r}"
                )
        else:
            check_reachable(matched_branches, "WHEN MATCHED")
            br = parse_update_or_delete(action, action_u)
            if br is None:
                raise NotImplementedError(
                    f"MERGE: cannot parse MATCHED action {action_u[:40]!r}"
                )
            matched_branches.append((cond, *br))

    # legacy single-branch mirror (drives the whole-row fast path and
    # the pre-existing single-branch executor)
    when_matched = "ignore"
    assignments: list[tuple[str, str]] = []
    matched_condition: str | None = None
    if len(matched_branches) == 1 and matched_branches[0][1] in (
        "update",
        "delete",
    ):
        matched_condition, when_matched, assignments = matched_branches[0]
    trailing = when_text[covered_to:].strip().rstrip(";").strip()
    if trailing:
        raise NotImplementedError(
            f"MERGE: cannot parse trailing clause {trailing[:80]!r}"
        )
    insert_unmatched = False
    insert_cols: list[str] = []
    insert_values: list[str] = []
    if (
        len(not_matched_branches) == 1
        and not_matched_branches[0][0] is None
        and not_matched_branches[0][1] is not None
    ):
        insert_unmatched = True
        _, insert_cols, insert_values = not_matched_branches[0]
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
        matched_branches=matched_branches,
        not_matched_branches=not_matched_branches,
        by_source_branches=by_source_branches,
    )


def is_merge(sql: str) -> bool:
    return bool(re.match(r"^\s*MERGE\b", sql, re.I))
