"""EXPLAIN ANALYZE (plans/explain_analyze.py ↔ reference
multi_explain.c): executing a plan must yield real per-operator
metrics — scan/filter output rows that match independently computed
counts, shuffle record counts that match group cardinality — and the
SQL spelling must work through the session front door."""

from tests.conftest import SF_SMALL


def _sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_metrics_match_real_counts(spark):
    sess = _sess(spark)
    n_orders = spark.table("orders").count()
    n_filtered = spark.table("orders").filter("o_totalprice > 1000").count()
    n_groups = (
        spark.table("orders")
        .filter("o_totalprice > 1000")
        .select("o_orderstatus")
        .distinct()
        .count()
    )

    rows = sess.explain_analyze(
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "WHERE o_totalprice > 1000 GROUP BY o_orderstatus"
    ).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.operator, {})[r.metric] = r.value

    scan_op = next(op for op in by_op if op.startswith("Scan parquet"))
    # parquet pushes the o_totalprice filter to row-group level, so the
    # scan may emit fewer than the full table but at least the survivors
    assert n_filtered <= by_op[scan_op]["numOutputRows"] <= n_orders
    assert by_op["Filter"]["numOutputRows"] == n_filtered
    assert by_op["Exchange"]["shuffleRecordsWritten"] == n_groups

    # tree shape is preserved: depths increase from root, ids unique
    ids = {r.node_id for r in rows}
    assert len(ids) == max(ids) + 1
    assert min(r.depth for r in rows) == 0


def test_sql_spelling_and_conf_restored(spark):
    sess = _sess(spark)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    out = sess.sql(
        "EXPLAIN ANALYZE SELECT count(*) AS n FROM lineitem "
        "WHERE l_quantity < 10"
    ).collect()
    assert len(out) == 1
    text = out[0].explain_analyze
    assert "HashAggregate" in text and "numOutputRows=" in text
    # indented tree, scan at deeper level than the aggregate
    scan_line = next(ln for ln in text.splitlines() if "Scan parquet" in ln)
    assert scan_line.startswith("  ")
    assert spark.conf.get("spark.sql.adaptive.enabled") == old
