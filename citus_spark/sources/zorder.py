"""Z-order (Morton) clustering — multi-dimensional data layout for
row-group skipping.

A range layout on one column (repartitionByRange + sortWithinPartitions,
tests/test_storage.py) gives tight min/max footer stats — but only for
that column; a second dimension's stats stay full-range and its
predicates prune nothing. Interleaving the bits of both keys (the
Morton curve) makes row groups tight in BOTH dimensions at once, so
conjunctive 2-D predicates skip most groups. This is the standard
lakehouse OPTIMIZE ZORDER technique (Delta/Iceberg docs; Morton 1966)
expressed with plain Spark shuffles — no table format required.

Everything is JVM bit arithmetic (shiftleft/shiftright/bitwise or),
fully codegen'd; the z-key is deterministic so layouts are re-run
stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution: 16 bits × 2 dims = 32-bit key


def _scale_to_bits(col: Column, lo: Column, hi: Column) -> Column:
    """Map a numeric column into [0, 2^Z_BITS) by min/max scaling —
    rank-preserving, constant-time (no percentile pass)."""
    span = (hi - lo).cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(
        span > 0, span
    ).otherwise(F.lit(1.0))
    v = F.floor(unit * ((1 << Z_BITS) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(v, F.lit((1 << Z_BITS) - 1)))


def zorder_key(a: Column, b: Column) -> Column:
    """Interleave the low Z_BITS of two already-scaled long columns:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1."""
    key = F.lit(0).cast("long")
    for i in range(Z_BITS):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Rewrite `df` clustered on the Morton curve of (col_a, col_b):
    range-partition + sort by the z-key, so every parquet row group
    covers a small square in (a, b) space and carries tight footer
    min/max for BOTH columns. One shuffle, scale-shape identical to
    any range layout rewrite."""
    stats = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]
    za = _scale_to_bits(
        F.col(col_a), F.lit(stats.a_lo), F.lit(stats.a_hi)
    )
    zb = _scale_to_bits(
        F.col(col_b), F.lit(stats.b_lo), F.lit(stats.b_hi)
    )
    keyed = df.withColumn("_z", zorder_key(za, zb))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
