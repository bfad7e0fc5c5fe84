"""TopN heavy-hitter aggregate.

↔ reference `topn` extension distribution: worker `topn_add_agg`
builds a JSONB {item: count} sketch per shard, coordinator
`topn_union_agg` merges them (multi_logical_optimizer.h:50-51,83-84).
This is the one aggregate family the survey flagged as "real code we
owe" — Spark has no native re-aggregatable top-N.

Two forms:

- ``topn``        — exact top-k per group as rows (partial count
  aggregation map-side, then a window). The right default: exact,
  fully distributed, two shuffles.
- ``topn_map`` /  ``topn_union`` — the sketch form: a map<item,count>
  column per group that can be stored in a rollup table and merged
  later (the reference's idiom: INSERT..SELECT rollups storing topn
  JSONB columns, README.md:1755-1767). Merging unions counts and
  re-truncates to k — like the reference's sketch this is exact as
  long as per-merge truncation keeps enough headroom (we keep
  ``slack * k`` entries in stored sketches).

Built entirely from Spark's declarative aggregates (count, collect
into sorted struct arrays, map_from_entries) — JVM-side, no Python in
the aggregation path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topn(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact top-k items per group: (group_cols..., item, cnt, rank).

    Plan shape: partial+final count aggregation on (group, item), then
    a window partitioned by group — both shuffle on keys; no skew
    beyond the data's own (AQE handles hot groups).
    """
    from pyspark.sql.window import Window

    agg = F.count("*") if weight_col is None else F.sum(weight_col)
    counts = df.groupBy(*group_cols, item_col).agg(agg.cast("long").alias("cnt"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("cnt"), F.asc(item_col))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def topn_map(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    k: int,
    slack: int = 4,
) -> DataFrame:
    """Sketch form: one row per group with a map<item,count> of the
    top ``slack*k`` items (headroom so later merges stay exact for the
    true top-k, mirroring the reference sketch's capacity factor)."""
    counts = df.groupBy(*group_cols, item_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    entries = F.slice(
        F.sort_array(
            F.collect_list(F.struct(F.col("cnt"), F.col(item_col).alias("item"))),
            asc=False,
        ),
        1,
        slack * k,
    )
    return counts.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.transform(entries, lambda e: F.struct(e["item"], e["cnt"]))
        ).alias("topn")
    )


def topn_union(
    sketches: DataFrame,
    group_cols: Sequence[str],
    k: int,
    sketch_col: str = "topn",
    slack: int = 4,
) -> DataFrame:
    """Merge sketch rows (↔ topn_union_agg): explode the maps, sum
    counts per item, re-truncate. Multiple rows per group (e.g. one
    per day in a rollup table) collapse into one."""
    exploded = sketches.select(
        *group_cols, F.explode(F.col(sketch_col)).alias("item", "cnt")
    )
    summed = exploded.groupBy(*group_cols, "item").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    entries = F.slice(
        F.sort_array(
            F.collect_list(F.struct(F.col("cnt"), F.col("item"))), asc=False
        ),
        1,
        slack * k,
    )
    return summed.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.transform(entries, lambda e: F.struct(e["item"], e["cnt"]))
        ).alias(sketch_col)
    )


def topn_extract(
    sketches: DataFrame, group_cols: Sequence[str], k: int, sketch_col: str = "topn"
) -> DataFrame:
    """Finalize a sketch to exact rows (group..., item, cnt, rank)."""
    from pyspark.sql.window import Window

    exploded = sketches.select(
        *group_cols, F.explode(F.col(sketch_col)).alias("item", "cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.desc("cnt"), F.asc("item"))
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )
