"""Distributed prefix sum: two-phase result must equal the naive
global window exactly, and the plan must never collapse to a single
window partition (the 100 TB failure mode)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL


def test_two_phase_equals_naive_global_window(spark):
    from citus_spark.operators.prefix_sum import with_global_offset

    t = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n"),
        )
    )
    got = {
        r.doc_id: r.off
        for r in with_global_offset(
            t, "doc_id", "n", out_col="off", n_partitions=7
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.doc_id: r.off
        for r in t.withColumn(
            "off", (F.sum("n").over(w) - F.col("n")).cast("long")
        ).collect()
    }
    assert got == want
    assert min(want.values()) == 0


def test_window_runs_per_partition_not_single_task(spark):
    from citus_spark.operators.prefix_sum import with_global_offset

    t = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n"),
        )
    )
    out = with_global_offset(t, "doc_id", "n", out_col="off", n_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window's required distribution is the partition id, never a
    # global (empty) partition spec → no SinglePartition exchange for
    # the window
    assert "windowspecdefinition(_pid" in plan
