"""Re-aggregatable HLL sketch: accuracy, merge algebra, determinism."""

import pytest
from pyspark.sql import functions as F

from citus_spark.operators.hll import approx_ndv, hll_estimate, hll_sketch, hll_union
from tests.conftest import SF_SMALL


def test_accuracy_vs_exact(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = {
        r.l_returnflag: r.approx_ndv
        for r in approx_ndv(li, ["l_returnflag"], "l_partkey").collect()
    }
    want = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k in want:
        assert abs(got[k] - want[k]) / want[k] < 0.08, (k, got[k], want[k])


def test_union_of_partial_sketches_equals_full(spark):
    """Sketch halves separately, union, estimate — must equal the
    sketch of the whole (register-wise max is associative/idempotent:
    the exact property the reference's rollup idiom relies on)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    h1 = hll_sketch(li.filter("l_orderkey % 2 = 0"), ["l_returnflag"], "l_partkey")
    h2 = hll_sketch(li.filter("l_orderkey % 2 = 1"), ["l_returnflag"], "l_partkey")
    merged = hll_estimate(hll_union(h1.unionAll(h2), ["l_returnflag"]), ["l_returnflag"])
    whole = hll_estimate(
        hll_sketch(li, ["l_returnflag"], "l_partkey"), ["l_returnflag"]
    )
    a = {r.l_returnflag: r.approx_ndv for r in merged.collect()}
    b = {r.l_returnflag: r.approx_ndv for r in whole.collect()}
    assert a == b  # identical registers ⇒ identical estimates


def test_deterministic_across_runs(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    a = {r.event_type: r.approx_ndv for r in approx_ndv(ev, ["event_type"], "user_id").collect()}
    b = {r.event_type: r.approx_ndv for r in approx_ndv(ev, ["event_type"], "user_id").collect()}
    assert a == b
