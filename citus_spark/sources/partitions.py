"""Time-partition lifecycle management — ↔ the reference's
`create_time_partitions()` / `drop_old_partitions()` UDFs (Citus's
timeseries story: range-partition by time, create partitions ahead,
drop expired ones; the columnar+partitioning combo in its docs).

Spark-first translation: a directory-partitioned parquet layout keyed
by a derived period column. "Creating" partitions is implicit (writes
route by value — dynamic partition overwrite replaces only touched
periods); retention is an O(1) directory drop per expired period —
no row-level DELETE, exactly like the reference dropping a child
table. Time-scoped queries partition-prune (see
tests/test_tenant_isolation.py for the same gate on tenants).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PERIOD_COL = "_period"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    overwrite_touched_only: bool = True,
) -> None:
    """Write `df` partitioned by `granularity` periods of `ts_col`
    (period key = yyyy-MM-dd / yyyy-MM / yyyy-MM-dd-HH directory).
    With dynamic partition overwrite only the periods present in `df`
    are replaced — the idempotent backfill/upsert idiom."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}[
        granularity
    ]
    out = df.withColumn(PERIOD_COL, F.date_format(F.col(ts_col), fmt))
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if overwrite_touched_only:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(PERIOD_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def append_time_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "day"
) -> None:
    """Append rows to an existing layout, routing each row to its
    period directory (the COPY-FROM/ingest idiom — existing periods
    gain files, new periods appear; nothing is replaced)."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}[
        granularity
    ]
    (
        df.withColumn(PERIOD_COL, F.date_format(F.col(ts_col), fmt))
        .write.mode("append").partitionBy(PERIOD_COL).parquet(path)
    )


def list_partitions(path: str) -> list[str]:
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith(f"{PERIOD_COL}=")
    )


def drop_old_partitions(path: str, older_than: str) -> list[str]:
    """Drop every period strictly older than `older_than` (same string
    format as the written period key — lexicographic == chronological
    for the fixed-width formats above). Returns the dropped periods.
    O(1) per period: a directory remove, no data rewrite."""
    dropped = []
    for p in list_partitions(path):
        if p < older_than:
            shutil.rmtree(os.path.join(path, f"{PERIOD_COL}={p}"))
            dropped.append(p)
    return dropped


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back; the period column stays available for
    partition-pruned time-scoped queries."""
    return spark.read.parquet(path)
