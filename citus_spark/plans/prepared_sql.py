"""PREPARE / EXECUTE / DEALLOCATE and DECLARE..CURSOR / FETCH / CLOSE.

↔ reference: the regress suites run most statements twice — once
directly and once through a prepared statement (e.g.
src/test/regress/sql/multi_prepare_sql.sql, multi_prepare_plsql.sql),
and cursor FETCH loops appear throughout (multi_cursor tests). The
reference's planner caches the distributed plan per prepared
statement (distributed_planner.c plan cache keyed on the statement);
here Spark itself caches nothing across sql() calls, but parameter
substitution + routing through DistributedSession.sql gives the same
OBSERVABLE surface: any statement kind can be prepared, parameters
are $1..$n, and typed PREPARE argument lists apply casts.

Grammar (the regress subset):

    PREPARE name [(type, ...)] AS <statement>
    EXECUTE name [(arg, ...)]
    DEALLOCATE [PREPARE] { name | ALL }

    DECLARE name [NO SCROLL] CURSOR [WITH HOLD] FOR <query>
    FETCH [FORWARD] [ n | ALL | NEXT ] [FROM | IN] name
    MOVE  [FORWARD] [ n | ALL | NEXT ] [FROM | IN] name
    CLOSE { name | ALL }

Cursors stream through toLocalIterator() — partitions arrive on
demand, so FETCH 10 from a billion-row cursor never materializes the
relation driver-side (the same incremental-fetch contract as the
reference's executor cursors).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_PREPARE = re.compile(
    r"^\s*PREPARE\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<types>[^)]*)\)\s*)?AS\s+(?P<stmt>.+?)\s*;?\s*$",
    re.I | re.S,
)
_EXECUTE = re.compile(
    r"^\s*EXECUTE\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<args>.*)\)\s*)?;?\s*$",
    re.I | re.S,
)
_DEALLOCATE = re.compile(
    r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(?P<name>[A-Za-z_]\w*|ALL)\s*;?\s*$",
    re.I,
)
_DECLARE = re.compile(
    r"^\s*DECLARE\s+(?P<name>[A-Za-z_]\w*)\s+(?:NO\s+SCROLL\s+|SCROLL\s+)?"
    r"CURSOR\s+(?:WITH\s+HOLD\s+|WITHOUT\s+HOLD\s+)?FOR\s+(?P<q>.+?)\s*;?\s*$",
    re.I | re.S,
)
_FETCH_MOVE = re.compile(
    r"^\s*(?P<verb>FETCH|MOVE)\s+(?:FORWARD\s+)?"
    r"(?P<count>\d+|ALL|NEXT)?\s*(?:FROM\s+|IN\s+)?(?P<name>[A-Za-z_]\w*)\s*;?\s*$",
    re.I,
)
_CLOSE = re.compile(
    r"^\s*CLOSE\s+(?P<name>[A-Za-z_]\w*|ALL)\s*;?\s*$", re.I
)

_HEAD = re.compile(
    r"^\s*(PREPARE|EXECUTE|DEALLOCATE|DECLARE|FETCH|MOVE|CLOSE)\b", re.I
)


@dataclass
class Prepared:
    sql: str
    types: list[str]  # may be empty (untyped)


def is_prepared_statement(sql: str) -> bool:
    return bool(_HEAD.match(sql))


def parse(sql: str):
    """→ (kind, match) or None. Kinds: prepare/execute/deallocate/
    declare/fetch_move/close."""
    for kind, rx in (
        ("prepare", _PREPARE),
        ("execute", _EXECUTE),
        ("deallocate", _DEALLOCATE),
        ("declare", _DECLARE),
        ("fetch_move", _FETCH_MOVE),
        ("close", _CLOSE),
    ):
        m = rx.match(sql)
        if m:
            return kind, m
    return None


def split_args(text: str) -> list[str]:
    """Top-level comma split of an EXECUTE argument list."""
    from citus_spark.plans.rewrites import _split_top_level

    return [a.strip() for a in _split_top_level(text) if a.strip()]


def substitute_params(stmt: str, args: list[str], types: list[str]) -> str:
    """Replace $1..$n with the argument expressions (cast when the
    PREPARE carried a type list), outside string literals. A $n
    beyond the argument count is an error, like PG's."""
    from citus_spark.plans.rewrites import _segments

    if types and len(types) != len(args):
        raise ValueError(
            f"EXECUTE: {len(args)} argument(s) for {len(types)} "
            "declared parameter type(s)"
        )
    # PG type names (text, int4, float8 ...) map to Spark's before
    # they reach the emitted CAST — `CAST(NULL AS text)` is a Spark
    # parse error (↔ reference null_parameters.sql regress)
    from citus_spark.plans.ddl_sql import _map_type

    rendered = [
        f"CAST({a} AS {_map_type(t)})" if types else f"({a})"
        for a, t in zip(args, types or [""] * len(args))
    ]

    def repl(m: re.Match) -> str:
        i = int(m.group(1))
        if not 1 <= i <= len(rendered):
            raise ValueError(
                f"EXECUTE: statement references ${i} but only "
                f"{len(rendered)} argument(s) were supplied"
            )
        return rendered[i - 1]

    out = []
    for kind, text in _segments(stmt):
        out.append(
            re.sub(r"\$(\d+)", repl, text) if kind == "code" else text
        )
    return "".join(out)
