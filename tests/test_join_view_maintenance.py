"""Incremental join-view maintenance: any schedule of per-side append
deltas must yield exactly the full-recompute aggregate — including
join partners that arrive in DIFFERENT refreshes — and replay must be
a no-op."""

from pyspark.sql import functions as F

from citus_spark.operators.join_view_maintenance import IncrementalJoinRollup
from tests.conftest import SF_SMALL


def _full_reference(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    v = F.col("l_extendedprice")
    return {
        r.o_custkey: (r.n, r.total)
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(v).cast("long")).cast("double")
                + F.sum(
                    F.floor((v - F.floor(v)) * 1_000_000 + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / 1_000_000
            ).alias("total"),
        )
        .collect()
    }


def test_staggered_deltas_equal_full_recompute(spark, tmp_path):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    roll = IncrementalJoinRollup(
        spark,
        str(tmp_path / "rev"),
        join_keys=("o_orderkey", "l_orderkey"),
        group_cols=["o_custkey"],
        value_col="l_extendedprice",
        a_id="o_orderkey",
        b_id="l_orderkey",
    )
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0]
    cut1, cut2 = max_ok // 4, max_ok // 2

    # STAGGERED arrival: refresh 1 sees early orders but only very
    # early lineitems; partners for many pairs arrive in later
    # refreshes on the other side
    n1 = roll.refresh(
        o.filter(F.col("o_orderkey") <= cut1),
        li.filter(F.col("l_orderkey") <= cut1 // 2),
    )
    n2 = roll.refresh(
        o.filter(F.col("o_orderkey") <= cut2),
        li.filter(F.col("l_orderkey") <= cut1),
    )
    n3 = roll.refresh(o, li)
    total_pairs = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n1 + n2 + n3 == total_pairs, "each pair aggregated exactly once"

    got = {r.o_custkey: (r.n, r.total_value) for r in roll.read().collect()}
    assert got == _full_reference(spark)

    # replay with no new rows is a no-op
    assert roll.refresh(o, li) == 0
    got2 = {r.o_custkey: (r.n, r.total_value) for r in roll.read().collect()}
    assert got2 == got


def test_unmatched_append_then_partner(spark, tmp_path):
    """An A row whose B partner arrives only in the NEXT refresh must
    be paired exactly once."""
    a = spark.createDataFrame(
        [(1, 10, "g1"), (2, 20, "g2")], "aid long, k long, g string"
    )
    b1 = spark.createDataFrame([], "bid long, k long, v double")
    b2 = spark.createDataFrame(
        [(100, 10, 5.5), (101, 20, 1.25)], "bid long, k long, v double"
    )
    roll = IncrementalJoinRollup(
        spark,
        str(tmp_path / "jv"),
        join_keys=("k", "k"),
        group_cols=["g"],
        value_col="v",
        a_id="aid",
        b_id="bid",
    )
    assert roll.refresh(a, b1) == 0  # orders with no lines yet
    assert roll.refresh(a, b2) == 2  # partners arrive later
    got = {r.g: (r.n, r.total_value) for r in roll.read().collect()}
    assert got == {"g1": (1, 5.5), "g2": (1, 1.25)}
    assert roll.refresh(a, b2) == 0


def test_delta_filters_reach_the_scan(spark, tmp_path):
    """Both sides' watermark filters must be pushed predicates — at
    scale (id-partitioned layout) this is the prune that makes refresh
    O(delta), mirroring the plain rollup's delta-scan gate."""
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    roll = IncrementalJoinRollup(
        spark,
        str(tmp_path / "rev2"),
        join_keys=("o_orderkey", "l_orderkey"),
        group_cols=["o_custkey"],
        value_col="l_extendedprice",
        a_id="o_orderkey",
        b_id="l_orderkey",
    )
    roll.refresh(
        o.filter(F.col("o_orderkey") <= 500),
        li.filter(F.col("l_orderkey") <= 500),
    )
    wa, wb = roll.watermarks()
    assert wa <= 500 and wb <= 500
    da = o.filter(F.col("o_orderkey") > wa)
    plan = da._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_orderkey" in plan
