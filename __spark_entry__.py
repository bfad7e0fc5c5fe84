"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``citus_spark`` package; the query
inventory is assembled in ``citus_spark.queries`` (one module per
SURVEY.md §2 area).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import citus_spark.queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 on /root/testdata/sf0.001 — scan +
    filter + 8-aggregate partial/final split + sort, the reference's
    own minimum e2e slice (multi_tpch_query1.sql)."""
    return q.QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checked query; entries
    absent here (UDF-backed sketches, sampling) get rows-only checks."""
    return dict(q.ORACLES)
