"""EXPLAIN ANALYZE — execute a plan and report per-operator metrics.

↔ reference EXPLAIN ANALYZE support (multi_explain.c: runs the
distributed plan, then attaches per-task execution stats — tuples
produced, time per node — to the EXPLAIN tree; exercised heavily by
src/test/regress multi_explain.sql). Spark collects the same stats as
SQLMetrics on every physical operator; they normally surface only in
the web UI. This module executes the query (toRdd().count() — rows
are counted where they live, never shipped to the driver) and walks
the executed plan, returning one row per (operator, metric).

AQE is disabled for the instrumented run: adaptive re-planning swaps
subtrees mid-flight, so the stable non-adaptive tree is the one worth
annotating (the reference's EXPLAIN ANALYZE likewise reports the plan
it actually ran, not a re-planned one). The session conf is restored
afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# metrics promoted into the text rendering, in display order — the
# analog of the reference's "actual rows / loops / time" line
_TEXT_METRICS = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "scanTime",
    "aggTime",
    "sortTime",
    "spillSize",
    "shuffleRecordsWritten",
    "shuffleBytesWritten",
    "dataSize",
    "buildTime",
    "pipelineTime",
)


def _walk(node, depth: int, node_id: list[int], out: list) -> None:
    nid = node_id[0]
    node_id[0] += 1
    metrics = []
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        metrics.append((kv._1(), int(kv._2().value())))
    out.append((nid, depth, node.nodeName(), metrics))
    children = node.children()
    for i in range(children.size()):
        _walk(children.apply(i), depth + 1, node_id, out)


def run_explain_analyze(
    spark: SparkSession, df: DataFrame
) -> list[tuple[int, int, str, list[tuple[str, int]]]]:
    """Execute `df`'s plan and return the annotated tree as
    (node_id, depth, operator, [(metric, value), ...]) tuples in
    pre-order."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()  # execute: metrics accumulate, no rows to driver
    out: list = []
    _walk(qe.executedPlan(), 0, [0], out)
    return out


def explain_analyze(
    session, query: str | DataFrame
) -> DataFrame:
    """One row per (operator, metric): node_id/depth preserve the tree
    shape for programmatic use; `explain_analyze_text` renders it."""
    spark = session.spark
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = session.sql(query) if isinstance(query, str) else query
        tree = run_explain_analyze(spark, df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    rows = [
        (nid, depth, op, metric, value)
        for nid, depth, op, metrics in tree
        for metric, value in (metrics or [(None, None)])
    ]
    return spark.createDataFrame(
        rows,
        "node_id int, depth int, operator string, metric string, value long",
    )


def explain_analyze_text(session, query: str | DataFrame) -> str:
    """Reference-style annotated tree: one line per operator with its
    headline metrics."""
    spark = session.spark
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = session.sql(query) if isinstance(query, str) else query
        tree = run_explain_analyze(spark, df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    lines = []
    for _nid, depth, op, metrics in tree:
        md = dict(metrics)
        shown = [
            f"{k}={md[k]}" for k in _TEXT_METRICS if k in md
        ]
        suffix = f"  ({', '.join(shown)})" if shown else ""
        lines.append("  " * depth + op + suffix)
    return "\n".join(lines)
