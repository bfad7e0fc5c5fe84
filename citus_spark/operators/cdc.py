"""Snapshot change-data-capture: diff two table snapshots into a
change set (insert / delete / update rows).

The reference captures changes physically, by decoding the WAL of
each shard and re-mapping shard OIDs to the logical table
(reference src/backend/distributed/cdc/cdc_decoder.c). Spark has no
WAL; the analytical equivalent — and the common lakehouse idiom — is
a snapshot diff: FULL OUTER JOIN the previous and current snapshots
on the key and classify each row. The join shuffles both sides by
the key once (or zero times for snapshots co-located/bucketed on the
key — the same co-location idea as every other dist-key join here),
and the change classification is pure row-local expression work, so
the operator scales like any single equi-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Return (keys..., op, old_<col>..., new_<col>...) for every key
    whose presence or compared values changed between snapshots.

    op ∈ ('insert', 'delete', 'update'); unchanged rows are dropped.
    Value comparison is null-safe (NULL == NULL is unchanged).
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{k}") == F.col(f"_nk_{k}") for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_keys = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k) for k in keys
    ]
    return (
        j.select(
            *out_keys,
            op.alias("op"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
        .filter(F.col("op") != "unchanged")
    )
