"""Cross-engine deterministic function helpers.

The dedup/similarity operators need primitives whose results are
bit-identical in Spark and the DuckDB oracle:

- ``hash64``: a portable 60-bit integer hash (md5 prefix → bigint).
  Spark's native xxhash64/hash are faster but not reproducible in
  DuckDB; the oracle-checked operators use this portable one, while
  pure-Spark scale paths may switch to F.xxhash64 (same plan shape).
- sequential double folds: IEEE addition is order-sensitive, so both
  engines must reduce arrays left-to-right (Spark ``aggregate``,
  DuckDB ``list_reduce``) — empirically bit-exact (see tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """Spark-SQL text form of hash64."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def hash64_duck(expr: str) -> str:
    """DuckDB text form of hash64 — same value as hash64_sql."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def dot_fold_sql(a: str, b: str) -> str:
    """Spark SQL: exact-order sequential double dot product."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def dot_fold_duck(a: str, b: str) -> str:
    """DuckDB: the same sequential double dot product (list_reduce
    folds left-to-right; prepend 0.0 to mirror Spark's init value)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )
