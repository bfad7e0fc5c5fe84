"""Multi-table hyperplane LSH: recall must reach the production
target by unioning independent tables, and must grow monotonically
with the table count (the n_tables dial is the whole point).

Fully deterministic — corpus and planes both come from fixed seeds,
so each recall value is a constant, not a flaky sample.
"""

import numpy as np
import pytest

from citus_spark.operators.ann_lsh import lsh_ann_candidates, lsh_ann_topk

DIM = 64


def _corpus():
    rng = np.random.default_rng(123)
    rows, planted = [], []
    for i in range(30):
        v = rng.normal(size=DIM)
        v /= np.linalg.norm(v)
        target_c = 0.82 + 0.10 * rng.random()  # cosine in [0.82, 0.92]
        n = rng.normal(size=DIM)
        n -= (n @ v) * v  # orthogonal noise
        n /= np.linalg.norm(n)
        w = target_c * v + np.sqrt(1 - target_c**2) * n
        rows.append((i, v.tolist()))
        rows.append((1000 + i, w.tolist()))
        planted.append((i, 1000 + i, float(v @ w)))
    for i in range(60):
        u = rng.normal(size=DIM)
        rows.append((2000 + i, (u / np.linalg.norm(u)).tolist()))
    return rows, planted


def _recall(spark, rows, planted, n_tables):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.qid, r.cid)
        for r in lsh_ann_candidates(
            df, n_planes=6, n_tables=n_tables, seed=97
        ).collect()
    }
    hi = [(a, b) for a, b, c in planted if c >= 0.8]
    assert len(hi) >= 25
    return sum(1 for p in hi if p in got) / len(hi)


def test_recall_grows_with_tables_and_hits_target(spark):
    rows, planted = _corpus()
    recalls = {t: _recall(spark, rows, planted, t) for t in (1, 2, 4, 8)}
    # monotone in table count (a union can only add candidates)
    assert recalls[1] <= recalls[2] <= recalls[4] <= recalls[8]
    # a single 6-bit table cannot reach the target at cosine ~0.85
    # (per-table hit prob ~0.3) — the union is what gets there
    assert recalls[1] < 0.9
    assert recalls[8] >= 0.9, f"recall@8tables = {recalls[8]:.2f}"


def test_topk_rescore_exact_on_candidates(spark):
    """Survivor rescore must produce exact cosines: for planted pairs
    the operator's reported cosine equals the numpy dot product."""
    rows, planted = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = lsh_ann_topk(df, n_queries=30, top_k=3, n_planes=6, n_tables=8)
    got = {(r.qid, r.cid): r.cosine for r in out.collect()}
    planted_map = {(a, b): c for a, b, c in planted}
    checked = 0
    for (q, c), cos in got.items():
        if (q, c) in planted_map:
            assert cos == pytest.approx(planted_map[(q, c)], abs=1e-9)
            checked += 1
    assert checked >= 20, "most planted pairs should appear in top-k"
