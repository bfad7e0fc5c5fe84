"""queries.single_partition_sort — the terminal-sort rewrite (r9
verdict item #1): plan shape, ordering preservation, LIMIT/no-sort
no-ops, and the corpus-size scale gate."""

import os

import citus_spark.queries as q


SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_terminal_sort_becomes_single_partition(spark):
    df = q.QUERIES["having_filter"](spark, SF)
    plan = _plan(df)
    assert "Exchange SinglePartition" in plan
    assert "rangepartitioning" not in plan


def test_rows_and_order_identical_to_stock_sort(spark):
    q.load_views(spark, SF)
    sql = q.ORACLES["having_filter"]
    stock = [tuple(r) for r in spark.sql(sql).collect()]
    rewritten = [
        tuple(r) for r in q.QUERIES["having_filter"](spark, SF).collect()
    ]
    assert rewritten == stock


def test_limit_queries_keep_take_ordered(spark):
    df = q.QUERIES["tpch_q3"](spark, SF)  # terminal ORDER BY .. LIMIT
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_with_cte_top_sort_rewritten(spark):
    df = q.QUERIES["tpch_q9"](spark, SF)  # WithCTE-wrapped Sort
    assert "Exchange SinglePartition" in _plan(df)


def test_large_corpus_keeps_range_sort(spark):
    # simulate a cluster-scale corpus: the gate reads _CORPUS_BYTES
    key = os.path.abspath(SF)
    q.load_views(spark, SF)
    saved = q._CORPUS_BYTES.get(key)
    try:
        q._CORPUS_BYTES[key] = q._AQE_MIN_BYTES
        df = q.single_partition_sort(
            spark, spark.sql(q.ORACLES["having_filter"]), SF
        )
        assert "rangepartitioning" in _plan(df)
    finally:
        if saved is not None:
            q._CORPUS_BYTES[key] = saved


def test_no_terminal_sort_is_untouched(spark):
    q.load_views(spark, SF)
    df = spark.sql("SELECT count(*) AS n FROM orders")
    out = q.single_partition_sort(spark, df, SF)
    assert out is df or _plan(out) == _plan(df)
