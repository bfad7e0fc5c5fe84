"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall time of the headline set. Each query is
executed fully (noop sink — no driver-side collect) after a one-query
JVM warmup. Set BENCH_DUCKDB=1 to also time the DuckDB oracle on the
same parquet files for a local baseline comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q19",
    "tpch_q9",
    "topn_operator",
    "window_running_sum",
    "sessionize_events",
    "having_filter",
    "dedup_exact",
    "minhash_lsh_pairs",
    "text_quality",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from citus_spark.session import get_spark
    import citus_spark.queries as q

    spark = get_spark("citus_spark_bench")

    def run(name: str) -> float:
        df = q.QUERIES[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("tpch_q6")  # JVM/codegen warmup, untimed

    # min of three runs: steady-state time (first run pays whole-stage
    # codegen compilation; extra run shields against transient machine
    # load, which we observed inflating single queries 5-10×)
    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(min(run(name) for _ in range(3)), 4)

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }

    if os.environ.get("BENCH_DUCKDB"):
        import duckdb

        con = duckdb.connect()
        from citus_spark.queries import ALL_TABLES, ORACLES

        for t in ALL_TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        duck: dict[str, float] = {}
        for name in HEADLINE:
            if name in ORACLES:
                t0 = time.time()
                con.execute(ORACLES[name]).fetchall()
                duck[name] = round(time.time() - t0, 4)
        out["duckdb_baseline"] = duck
        out["duckdb_total"] = round(sum(duck.values()), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
