"""Opt-in SQL rewrites — the engine's counterpart of the reference's
planner GUCs.

- ``rewrite_count_distinct``: COUNT(DISTINCT x) → approx_count_distinct
  (x, rsd). ↔ citus.count_distinct_error_rate
  (multi_logical_optimizer.c:1711-1760: worker hll_add_agg +
  coordinator hll_union_agg). Spark's approx_count_distinct is the
  same HLL++ split executed by partial/final aggregation.
- ``pg_casts``: PostgreSQL `expr::type` → CAST(expr AS type), the most
  common PG-ism in ported queries. (Deeper PG semantic differences —
  integer division, collation order — are documented in README §SQL
  semantics rather than rewritten textually.)

These are regex-level rewrites applied before parsing, mirroring how
the reference rewrites at the Query-tree level. They are opt-in
(off by default) and deliberately conservative: they do not touch
quoted strings that don't match the patterns.
"""

from __future__ import annotations

import re

# COUNT(DISTINCT col) with a simple column or qualified name inside
_COUNT_DISTINCT = re.compile(
    r"\bCOUNT\s*\(\s*DISTINCT\s+([A-Za-z_][\w.]*)\s*\)", re.IGNORECASE
)

# expr::type (PG cast) where expr is a simple identifier/literal
_PG_CAST = re.compile(
    r"([A-Za-z_][\w.]*|'[^']*'|\d+(?:\.\d+)?)::([A-Za-z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)


def rewrite_count_distinct(sql: str, rsd: float = 0.023) -> str:
    """Rewrite exact COUNT(DISTINCT col) to approx_count_distinct.

    rsd default 2.3% ≈ HLL with 2^11 registers, close to the
    reference's citus.count_distinct_error_rate typical setting.
    """
    return _COUNT_DISTINCT.sub(rf"approx_count_distinct(\1, {rsd})", sql)


def pg_casts(sql: str) -> str:
    """Rewrite PostgreSQL ``expr::type`` casts to ANSI CAST."""
    return _PG_CAST.sub(r"CAST(\1 AS \2)", sql)
