"""Round-8 wave-2 pipeline entries: plan quality gates.

Value parity is driver-checked (tools/oracle_check.py passes at
sf0.001/0.01/0.1 for each); these tests pin the plan SHAPE so a
regression to row-at-a-time Python or an accidental unbounded
cartesian cannot land silently.
"""

import pytest

from tests.conftest import SF_SMALL

ENTRIES = [
    "source_divergence_drift",
    "rare_token_tail_mass",
    "sentence_dedup_within_doc",
    "curriculum_length_buckets",
    "collocation_lift",
    "source_jaccard_overlap",
    "token_entropy_by_lang",
]


@pytest.mark.parametrize("name", ENTRIES)
def test_no_python_eval_in_plan(spark, name):
    import citus_spark.queries as q

    plan = (
        q.QUERIES[name](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "name",
    # source_divergence_drift's sources×top-500 grid is an intended
    # BOUNDED nested-loop (|sources| × V, V fixed), so it is exempt;
    # the other three must never cartesian
    [n for n in ENTRIES if n != "source_divergence_drift"],
)
def test_no_cartesian(spark, name):
    import citus_spark.queries as q

    plan = (
        q.QUERIES[name](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_rows_nonempty(spark):
    import citus_spark.queries as q

    for name in ENTRIES:
        assert q.QUERIES[name](spark, SF_SMALL).limit(1).count() == 1
