"""Property test for the DSUM exact fixed-point sum idiom
(citus_spark/queries/__init__.py): for ANY list of doubles, DSUM must
equal the Python fixed-point reference and be bit-identical across
partition counts (order independence is the whole point — it is what
makes the Spark-vs-DuckDB comparisons exact at any parallelism)."""

import math

from hypothesis import given, settings, strategies as st

from citus_spark.queries import DSUM

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _reference(xs):
    a = sum(int(math.floor(x)) for x in xs)
    b = sum(int(math.floor((x - math.floor(x)) * 1e6 + 0.5)) for x in xs)
    return float(a) + float(b) / 1e6


@settings(max_examples=25, deadline=None)
@given(st.lists(finite, min_size=1, max_size=60))
def test_dsum_matches_reference_and_is_order_free(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    expr = DSUM("x", "s")
    r1 = df.repartition(1).selectExpr(expr).collect()[0].s
    r7 = df.repartition(7).selectExpr(expr).collect()[0].s
    assert r1 == r7  # bit-identical under any partitioning
    assert r1 == _reference(xs)
