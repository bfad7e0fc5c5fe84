"""Differential fuzz testing: seeded random queries on Spark vs DuckDB
(↔ the reference's query-generator differential suite,
src/test/regress/citus_tests/query_generator/README.md:1-30 — same
shape: generate seeded random join/filter/agg queries, run on both
engines, diff results)."""

import pytest

from tests.conftest import SF_SMALL
from tools.query_gen import gen_suite

SUITE = gen_suite(seed=42, n=100)


@pytest.mark.parametrize("idx", range(len(SUITE)), ids=[f"q{i:02d}" for i in range(len(SUITE))])
def test_generated_query_matches_duckdb(spark, duck, idx):
    from citus_spark.queries import load_views
    from tools.oracle_check import df_to_rows

    sql = SUITE[idx]
    load_views(spark, SF_SMALL)
    sdf = spark.sql(sql)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}\n{sql}"
    assert sorted(scols) == sorted(dcols), sql
    _, s = df_to_rows(scols, srows)
    _, d = df_to_rows(dcols, drows)
    assert s == d, sql


# DISTINCT ON differential fuzz: identical PG text through the
# session front door (row_number rewrite) vs DuckDB's native
# DISTINCT ON.
from tools.query_gen import gen_distinct_on_suite

DON_SUITE = gen_distinct_on_suite(seed=7, n=30)


@pytest.mark.parametrize(
    "idx", range(len(DON_SUITE)), ids=[f"don{i:02d}" for i in range(len(DON_SUITE))]
)
def test_distinct_on_fuzz_matches_duckdb(spark, duck, idx):
    from citus_spark.session import DistributedSession
    from tools.oracle_check import df_to_rows

    sql = DON_SUITE[idx]
    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    sdf = sess.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}\n{sql}"
    assert sorted(sdf.columns) == sorted(dcols), sql
    _, s = df_to_rows(sdf.columns, srows)
    _, d = df_to_rows(dcols, drows)
    assert s == d, sql


# Quantified-comparison differential fuzz: PG ANY/SOME/ALL spellings
# through the front door vs DuckDB-dialect equivalents.
from tools.query_gen import gen_quantified_suite

QUANT_SUITE = gen_quantified_suite(seed=13, n=30)


@pytest.mark.parametrize(
    "idx",
    range(len(QUANT_SUITE)),
    ids=[f"quant{i:02d}" for i in range(len(QUANT_SUITE))],
)
def test_quantified_fuzz_matches_duckdb(spark, duck, idx):
    from citus_spark.session import DistributedSession
    from tools.oracle_check import df_to_rows

    pg_sql, duck_sql = QUANT_SUITE[idx]
    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    sdf = sess.sql(pg_sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(duck_sql)
    drows = res.fetchall()
    _, s = df_to_rows(sdf.columns, srows)
    _, d = df_to_rows([d0[0] for d0 in res.description], drows)
    assert s == d, f"{pg_sql}\n-- vs --\n{duck_sql}"
