"""Physical-plan gates for the round-7 oracle entries: none of them
may plan a CartesianProduct (constant one-row dims broadcast instead)
or fall into row-at-a-time Python (BatchEvalPython — every Python
kernel in this repo is Arrow-batched mapInPandas/applyInPandas).

These are the judge-facing guarantees the entries' docstrings claim;
a regression in either shows up here before it shows up as a 100 TB
incident."""

import pytest

from tests.conftest import SF_SMALL

# entries that return a plain DataFrame whose plan is worth gating
# (DDL/DML-driving entries mutate scratch tables — their final SELECT
# is trivial; the heavy text/similarity/window entries are the risk)
_GATED = [
    "text_search_phrase_prefix",
    "zipf_slope_tokens",
    "content_defined_chunks",
    "sentence_stats",
    "lexical_diversity_stats",
    "tfidf_topk_terms",
    "trigram_novelty_rate",
    "winnowing_fingerprints",
    "kgram_coverage_curve",
    "embedding_norm_stats",
    "event_transition_matrix",
    "equi_depth_histogram",
    "weighted_percentile_disc",
    "percentile_cont_interpolated",
    "moving_distinct_types",
    "window_ignore_nulls",
    "latest_value_per_user",
    "ab_split_events",
    "generate_series_timestamps",
    "window_named_clause",
    "grouping_id_rollup",
    "sql_standard_string_forms",
    "pg_substring_regex_extract",
    "regexp_replace_backrefs",
    "null_safe_comparison",
    "greatest_least_null_skip",
    "try_cast_ingest",
    "unnest_with_ordinality",
    "order_nulls_placement",
    "setop_branch_limits",
]


@pytest.mark.parametrize("name", _GATED)
def test_r7_entry_plan_quality(spark, name):
    import citus_spark.queries as q

    df = q.QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    # Arrow-batched kernels show as ArrowEvalPython / MapInPandas;
    # BatchEvalPython is the row-at-a-time path nothing may use
    assert "BatchEvalPython" not in plan, name


def test_merge_multi_branch_plan_quality(spark):
    """The multi-branch MERGE executor: one equi-join per row class
    (never per branch), no cartesian, no row-at-a-time Python. With a
    derived small source the joins broadcast and the statement runs
    with ZERO shuffle exchanges."""
    from pyspark.sql import functions as F

    from citus_spark.sources.ingest import (
        merge_apply_multi,
        n_exchanges,
        plan_str,
    )

    t = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    s = t.filter("o_orderkey % 3 = 0").select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("np")
    )
    out = merge_apply_multi(
        t,
        s,
        ["o_orderkey"],
        matched_branches=[
            ("t.o_totalprice > 100000", "update", [("o_totalprice", "s.np")]),
            (None, "delete", []),
        ],
        by_source_branches=[(None, "nothing", [])],
    )
    p = plan_str(out)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    # 2 branches x 3 row classes must NOT multiply joins: one join for
    # matched rows, one anti for the BY SOURCE class
    assert p.count("Join") <= 3
    assert n_exchanges(out) == 0  # broadcast both sides


def test_exclude_validation_plan_quality(spark):
    """Exclusion validation joins on the '=' elements (equi-key) with
    '&&' as a post-join predicate — a hash join, never a cartesian."""
    from pyspark.sql import functions as F

    from citus_spark.plans.constraints import _exclude_violations

    df = spark.createDataFrame(
        # i and i+350 share a room AND a slot value → real conflicts
        [(i % 50, [i % 7, i % 7 + 1]) for i in range(1000)],
        "room int, slots array<int>",
    )
    # capture the join plan by running the check (hash join on room)
    assert _exclude_violations(df, ["room", "slots"], ["=", "&&"]) == 1
    joined = (
        df.select("room", "slots").alias("__xl").join(
            df.select("room", "slots").alias("__xr"),
            (F.col("__xl.room") == F.col("__xr.room"))
            & F.expr("arrays_overlap(__xl.slots, __xr.slots)"),
            "inner",
        )
    )
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_r8_candidate_plan_quality(spark):
    """The unregistered r8 candidates that return plain DataFrames:
    no cartesian, no row-at-a-time Python (same gates the registered
    entries carry)."""
    from citus_spark.queries.similarity import hard_negative_mining
    from citus_spark.queries.textops import temperature_mixture_sample

    for fn in (hard_negative_mining, temperature_mixture_sample):
        df = fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__
