"""Registry-wide physical-plan audit for scale-killers.

For EVERY registry entry, build the DataFrame at the given corpus and
scan its physical plan for patterns that do not survive 100 TB:

  - CartesianProduct / BroadcastNestedLoopJoin (non-constant inputs)
  - BatchEvalPython (row-at-a-time Python)
  - Window with an empty PARTITION BY over a non-limited input
    (single-partition WindowExec)
  - Exchange count (informational)

Prints one line per entry plus a summary of flagged entries. Exit 0
always — this is a survey tool; gates live in tests/test_plan_quality.

Usage: python tools/plan_audit.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(plan: str) -> dict:
    exchanges = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
    single_part = plan.count("Exchange SinglePartition")
    info = {
        "exchanges": exchanges,
        "single_partition_exchanges": single_part,
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython")
        + plan.count("MapInArrow")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        # Window [...] windowspecdefinition(...) with no partition cols:
        # spec starts directly with the order spec. Detect Window nodes
        # whose partition expression list is empty.
        "global_window": len(
            re.findall(r"Window \[[^\n]*\], \[\]$|Window \[[^\n]*windowspecdefinition\((?:[^,()]+ (?:ASC|DESC))", plan, re.M)
        ),
    }
    return info


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    from citus_spark.session import get_spark
    import citus_spark.queries as q

    spark = get_spark("citus_spark_plan_audit")
    results: dict[str, dict] = {}
    for name, fn in q.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[name] = audit_plan(plan)
        except Exception as exc:  # noqa: BLE001 — survey must not die
            results[name] = {"error": str(exc)[:200]}
            continue

    flagged = {
        n: r
        for n, r in results.items()
        if r.get("cartesian") or r.get("batch_eval_python")
    }
    for name, r in sorted(results.items()):
        print(name, json.dumps(r))
    print("---- flagged (cartesian / BatchEvalPython):", len(flagged))
    for name, r in flagged.items():
        print("FLAG", name, json.dumps(r))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
