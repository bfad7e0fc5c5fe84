"""Plan-quality gates: the physical plans must show predicate pushdown,
column pruning, broadcast of reference tables, and per-partition top-k
— the properties that make these queries survive a 1000× scale-up.
(↔ SURVEY.md §4: what Citus implements in shard_pruning.c /
multi_logical_optimizer.c, Catalyst must be *observed* doing.)"""

import re

import citus_spark.queries as q
from citus_spark.sources.ingest import plan_str
from tests.conftest import SF_SMALL


def test_q6_filter_pushdown(spark):
    """Q6's date/discount/quantity predicates must reach the parquet
    scan (chunk-skipping analog: columnar_reader.c SelectedChunkMask)."""
    df = q.QUERIES["tpch_q6"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "PushedFilters: [" in plan, plan
    # toString truncates long filter lists with "..."; inspect the
    # segment following the marker
    pushed = plan.split("PushedFilters: [", 1)[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_token_count_column_pruning(spark):
    """token_count projects (doc_id, text): the scan must not read
    lang/source/n_chars (↔ MultiProject pushdown / ColumnarAttrNeeded)."""
    df = q.QUERIES["token_count"](spark, SF_SMALL)
    plan = plan_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1)
    assert "doc_id" in cols and "text" in cols
    assert "lang" not in cols and "source" not in cols and "n_chars" not in cols


def test_q14_broadcasts_reference_table(spark):
    """part is a reference table → the join must be a broadcast join,
    not a shuffle join (↔ REFERENCE_JOIN, multi_join_order.h:33)."""
    df = q.QUERIES["tpch_q14"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_reference_table_broadcasts_above_threshold(spark):
    """A reference table must broadcast because the CATALOG says so,
    not because it happens to fit under autoBroadcastJoinThreshold.
    With the threshold disabled (-1), the hint baked into the
    catalog-registered view is the only thing that can make this a
    broadcast join (↔ REFERENCE_JOIN, multi_join_order.h:33 — Citus
    replicated tables never repartition, whatever their size)."""
    from citus_spark.session import DistributedSession

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        sess = DistributedSession(spark)
        sess.load_tables(SF_SMALL)
        # AFTER load_tables: load_views re-derives the threshold per
        # corpus, so the at-scale pin must come last
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = sess.sql(
            """
            SELECT p_brand, count(*) AS n
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
            """
        )
        plan = plan_str(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        # sanity: without the catalog the same query shuffle-joins
        from citus_spark.queries import load_views

        load_views(spark, SF_SMALL)  # re-register plain views
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = spark.sql(
            """
            SELECT p_brand, count(*) AS n
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
            """
        )
        assert "BroadcastHashJoin" not in plan_str(plain), plan_str(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        from citus_spark.queries import load_views

        load_views(spark, SF_SMALL)


def test_global_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    top-k + merge — ↔ WorkerLimitCount per-shard LIMIT pushdown)."""
    df = q.QUERIES["global_topk"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_q1_partial_final_aggregate_split(spark):
    """Q1 must plan two-phase aggregation (partial before the
    exchange, final after) — the worker/master ExtendedOp split."""
    df = q.QUERIES["tpch_q1"](spark, SF_SMALL)
    plan = plan_str(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange hashpartitioning" in plan, plan


def test_window_on_dist_col_no_exchange_when_bucketed(spark):
    """Window PARTITION BY the bucketing column reuses the storage
    partitioning — zero exchanges. This is the reference's window
    pushdown rule (SafeToPushdownWindowFunction: PARTITION BY must
    contain the dist col) realized physically instead of as a planner
    restriction."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from citus_spark.sources.ingest import n_exchanges, write_distributed

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    write_distributed(orders, "t_orders_w", "o_custkey", buckets=8)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    df = spark.table("t_orders_w").withColumn("rn", F.row_number().over(w))
    assert n_exchanges(df) == 0, plan_str(df)
    assert df.count() == orders.count()


def test_ch_stock_level_dual_repartition_join(spark):
    """ch_stock_level joins order_line⋈stock on (item, warehouse) —
    neither side's natural key — so BOTH sides must repartition on the
    join key (↔ DUAL_PARTITION_JOIN, multi_join_order.h:38). The plan
    must be a shuffle join with hash exchanges on both inputs, not a
    broadcast (at 100 TB stock is huge) and not a cartesian."""
    # at fixture scale Catalyst rightly broadcasts the small stock
    # side; the dual-repartition claim is about the above-threshold
    # regime, so disable broadcast to see the at-scale plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # build FIRST (load_views re-derives the threshold per
        # corpus), pin -1 before planning (plans resolve at explain)
        df = q.QUERIES["ch_stock_level"](spark, SF_SMALL)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_str(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # (a CartesianProduct appears for the intentional part×warehouses
    # stock derivation — the ASSERTED property is the candidate join)
    assert plan.count("Exchange hashpartitioning") >= 2, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan


def test_explain_distribution_report(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    report = sess.explain_distribution(
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag"
    )
    assert report.startswith("Distributed plan:")
    assert "shuffle exchange(s)" in report and "scan(s)" in report


def test_date_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned parquet + date filter ⇒ partition pruning at
    scan time (↔ PruneShards on range distribution)."""
    out = str(tmp_path / "events_by_day")
    ev = q.QUERIES["date_trunc_rollup"]  # ensure views loaded
    from citus_spark.queries import load_views
    from pyspark.sql import functions as F

    load_views(spark, SF_SMALL)
    events = spark.table("events").withColumn("day", F.to_date("ts"))
    events.write.partitionBy("day").mode("overwrite").parquet(out)
    scan = spark.read.parquet(out).filter(F.col("day") == "2024-01-02")
    plan = plan_str(scan)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan
    assert scan.count() > 0


def test_window_exclude_single_window_node(spark):
    """The EXCLUDE emulation's two frames (requested + peer-group)
    must fuse into ONE Window node — same partitioning and sort — so
    exclusion costs no second shuffle or sort."""
    import __spark_entry__ as e

    df = e.queries()["window_exclude_modes"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1


def test_session_window_partial_aggregation_before_exchange(spark):
    """session_window_native must plan the partial-aggregatable shape:
    map-side partial session aggregation BEFORE the user_id exchange,
    then MergingSessions + final agg — never a raw-event sort through
    a Window chain. This is the formulation that bounds the shuffle to
    session fragments (not events) at 100 TB."""
    import __spark_entry__ as e

    df = e.queries()["session_window_native"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MergingSessions" in plan
    assert "partial_count" in plan
    # partial agg runs upstream of (deeper than) the hash exchange
    assert plan.index("partial_count") > plan.index("Exchange hashpartitioning")
    assert "Window" not in plan


def test_ngram_lm_two_phase_aggregation_no_cartesian(spark):
    """ngram_lm_quality's model training must plan as two-phase
    aggregations (partial before each exchange) and its scoring join
    must never be a CartesianProduct — the single-row vocabulary
    scalar joins broadcast-side, everything else shuffles on its
    key. This is the shape that keeps the LM scoring pipeline linear
    at corpus scale."""
    df = q.QUERIES["ngram_lm_quality"](spark, SF_SMALL)
    plan = plan_str(df)
    assert plan.count("HashAggregate") >= 6, plan  # 3 aggs × partial/final
    assert "CartesianProduct" not in plan, plan
    assert "Exchange hashpartitioning" in plan, plan


def test_dup_passages_partial_agg_no_cartesian(spark):
    """Duplicate-passage detection must stay the banded shape: the
    exploded k-gram stream partial-aggregates map-side before the one
    hash exchange on the fingerprint, the distinct-doc count plans as
    two-phase, and nothing degenerates into a cartesian or a single-
    task global sort. This is what keeps substring dedup linear at
    100 TB — the shuffle carries (hash, partial counts), never
    doc-pair candidates."""
    import __spark_entry__ as e

    for name in ("dup_passages_topk", "dup_passage_doc_share"):
        df = e.queries()[name](spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "Exchange hashpartitioning" in plan, name
        assert "partial" in plan, name  # map-side combine before shuffle
        # top-k entry must not globally sort the gram stream
        if name == "dup_passages_topk":
            assert "TakeOrderedAndProject" in plan


def test_vocab_coverage_cuts_before_window(spark):
    """vocab_coverage_topn must plan a distributed TakeOrdered cut of
    the vocabulary BEFORE the cumulative-share window — a global sort
    of all token types in one partition is the scale-killer shape."""
    df = q.QUERIES["vocab_coverage_topn"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    # the window must consume the take-ordered output, not the raw
    # aggregate: the plan tree lists children below parents, so the
    # TakeOrdered node must appear BELOW (after) the Window node
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_crosstab_pivot_single_aggregate_no_join(spark):
    """The PIVOT must compile to conditional aggregates over ONE scan
    (partial/final split) — never a self-join per category."""
    df = q.QUERIES["crosstab_pivot"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2, plan
    assert "partial_" in plan, plan


def test_time_weighted_avg_single_user_shuffle(spark):
    """twa's lead() window and final aggregate both key on user_id:
    one hash exchange total (plus the presentation sort)."""
    df = q.QUERIES["time_weighted_avg"](spark, SF_SMALL)
    plan = plan_str(df)
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges <= 1, plan


def test_composite_quality_filter_no_shuffle(spark):
    """The rule DAG is a pure per-row map — no exchange except the
    presentation sort."""
    df = q.QUERIES["composite_quality_filter"](spark, SF_SMALL)
    plan = plan_str(df)
    assert "Exchange hashpartitioning" not in plan, plan
