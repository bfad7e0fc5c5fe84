"""snapshot_diff unit behavior: op classification, NULL-safe value
compare, and the single-join plan shape."""

from pyspark.sql import Row


def _diff(spark, old_rows, new_rows):
    from citus_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(old_rows, "k bigint, v string, x double")
    new = spark.createDataFrame(new_rows, "k bigint, v string, x double")
    out = snapshot_diff(old, new, keys=["k"], compare_cols=["v", "x"])
    return {r.k: r for r in out.collect()}


def test_insert_delete_update_unchanged(spark):
    got = _diff(
        spark,
        [Row(k=1, v="a", x=1.0), Row(k=2, v="b", x=2.0), Row(k=3, v="c", x=3.0)],
        [Row(k=2, v="b", x=2.0), Row(k=3, v="C", x=3.0), Row(k=4, v="d", x=4.0)],
    )
    assert set(got) == {1, 3, 4}  # k=2 unchanged → dropped
    assert got[1].op == "delete" and got[1].new_v is None
    assert got[3].op == "update" and (got[3].old_v, got[3].new_v) == ("c", "C")
    assert got[4].op == "insert" and got[4].old_v is None


def test_null_safe_compare(spark):
    got = _diff(
        spark,
        [Row(k=1, v=None, x=1.0), Row(k=2, v="b", x=None)],
        [Row(k=1, v=None, x=1.0), Row(k=2, v="b", x=5.0)],
    )
    # NULL == NULL is unchanged; NULL → value is an update
    assert set(got) == {2}
    assert got[2].op == "update" and got[2].old_x is None and got[2].new_x == 5.0


def test_single_join_plan(spark):
    from citus_spark.operators.cdc import snapshot_diff

    old = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    new = spark.range(100).selectExpr("id AS k", "CAST(id + 1 AS STRING) AS v")
    plan = (
        snapshot_diff(old, new, ["k"], ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one join, classification is expression-only on top
    assert plan.count("Join") >= 1
    first = plan.split("\n")[0]
    assert "Join" not in first  # project/filter on top, join below


def test_ivf_nprobe_monotone(spark):
    """nprobe=2 must never find a worse best-neighbor than nprobe=1
    (it searches a superset of cells)."""
    from citus_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    r1 = {
        r.qid: r.cosine
        for r in QUERIES["ivf_topk"](spark, SF_SMALL).collect()
        if r.rk == 1
    }
    r2 = {
        r.qid: r.cosine
        for r in QUERIES["ivf_topk_nprobe2"](spark, SF_SMALL).collect()
        if r.rk == 1
    }
    assert set(r1) <= set(r2)
    for qid, c in r1.items():
        assert r2[qid] >= c - 1e-12, qid
