"""Query registry: the engine's e2e surface, mirrored from the
reference's regression suites (SURVEY.md §5).

Two registration styles:

- **shared SQL**: one ANSI-SQL string executed verbatim by both Spark
  and the DuckDB oracle. This is the preferred style (it is also how
  the reference tests itself — the same SQL against Citus tables and
  plain PostgreSQL, src/test/regress/citus_tests/query_generator).
  Aggregates over doubles are written as
  `CAST(sum(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)` so the result is
  bit-identical regardless of partition/summation order — exact
  decimal arithmetic makes the comparison scale-independent.

- **split impl**: a Spark-side callable (DataFrame API / UDF path)
  plus a DuckDB-dialect oracle SQL, used where dialects diverge
  (json, array lambdas) or where the Spark plan is the point
  (LSH, pandas-UDF operators). Entries with no oracle get the
  driver's weaker rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> spark callable
QUERIES: dict[str, QueryFn] = {}
# name -> duckdb-runnable oracle SQL (omit for rows-only checks)
ORACLES: dict[str, str] = {}


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table present in sf_dir as a temp view.

    events.ts is stored as parquet TIMESTAMP(NANOS); with
    spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a long we
    convert to a microsecond timestamp (integer div — the long exceeds
    double precision). The data has no sub-microsecond component.
    """
    from pyspark.sql import functions as F

    # defensive: the harness may hand us a vanilla session; both confs
    # are runtime-settable and required for correct reads/compares
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)

    found = 0
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        found += 1
        df = spark.read.parquet(path)
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        df.createOrReplaceTempView(t)
    if not found:
        # fail loudly rather than silently querying stale temp views
        raise FileNotFoundError(f"no *.parquet test tables under {sf_dir}")


def _ship_package(spark: SparkSession) -> None:
    """Make `citus_spark` importable on Spark's Python workers.

    Pandas-UDF/applyInPandas kernels defined in this package pickle by
    reference, so workers must import the package — but workers only
    inherit the driver's cwd, not runtime sys.path edits. Shipping a
    package zip via addPyFile works for any session, local or cluster
    (at cluster scale this is also the correct deployment mechanism).
    """
    sc = spark.sparkContext
    if getattr(sc, "_citus_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tempfile.gettempdir(), "citus_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._citus_spark_shipped = True


def register_shared_sql(name: str, sql: str) -> None:
    """Register a query whose Spark and oracle forms are the same SQL."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = name
    run.__doc__ = sql
    QUERIES[name] = run
    ORACLES[name] = sql


def register_split(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    """Register a Spark-side implementation with an optional
    DuckDB-dialect oracle."""
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def DSUM(expr: str, alias: str) -> str:
    """Exact order-independent sum of a double expression, portable
    across engines — dual-bigint fixed-point accumulation:

      int part:  sum(floor(x))          as bigint
      frac part: sum(floor(frac(x)*1e6 + 0.5)) as bigint

    Per-row scalar IEEE ops (floor/sub/mul) are identical in every
    engine; only *reduction order* varies between engines — and bigint
    sums are order-free. Equivalent to summing x rounded to 6 decimal
    places. ~3× faster than decimal aggregation in Spark (long sums
    stay in whole-stage codegen; decimal sums box BigDecimal).

    Capacity: |frac sum| ≤ 1e6/row → safe to ~9e12 rows per group;
    int sum safe to ~9e18/max|x|. Beyond that, widen to the decimal
    formulation (`CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`).
    """
    return (
        f"(CAST(sum(CAST(floor({expr}) AS BIGINT)) AS DOUBLE)"
        f" + CAST(sum(CAST(floor((({expr}) - floor({expr})) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS DOUBLE) / 1000000.0) AS {alias}"
    )


def DAVG(expr: str, count_expr: str, alias: str) -> str:
    """Order-independent average built from DSUM components."""
    body = DSUM(expr, "_x").rsplit(" AS ", 1)[0]
    return f"{body} / {count_expr} AS {alias}"


def _import_all() -> None:
    """Populate QUERIES/ORACLES from every query module."""
    from citus_spark.queries import (  # noqa: F401
        analytics,
        approx,
        dedup,
        similarity,
        textops,
        tpch,
    )


_import_all()
