"""Every oracle-checked query must match DuckDB exactly at sf0.001.

This is the same gate the driver runs at sf0.01 (CORRECTNESS_r{N});
running it at the smallest scale keeps the suite fast while the
standalone `tools/oracle_check.py` covers sf0.01/sf0.1.
"""

import pytest

from tests.conftest import SF_SMALL


def _pairs():
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    return [(name, qs[name], os_[name]) for name in qs if name in os_]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_matches_oracle(spark, duck, name, fn, oracle):
    from tools.oracle_check import df_to_rows

    sdf = fn(spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    _, s = df_to_rows(scols, srows)
    _, d = df_to_rows(dcols, drows)
    assert s == d


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a stable
    schema at the smallest scale."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    for name, fn in qs.items():
        if name in os_:
            continue
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.collect()


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
