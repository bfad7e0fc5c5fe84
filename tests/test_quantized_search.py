"""int8 scalar quantization + Matryoshka truncated-dim search:
the quantized/truncated candidate pass must surface planted exact
duplicates at rank 1, and the fixture-table entries must hold their
structural invariants (full top-k per query, no self pairs, sorted
descending, bounded cosines).

Planted corpora are deterministic (fixed seed), so every assertion
is a constant property, not a flaky sample.
"""

import numpy as np

from citus_spark.queries.similarity import (
    N_QUERIES,
    TOP_K,
    int8_quant_topk,
    matryoshka_topk,
)

SF = "/root/testdata/sf0.01"


def _check_structure(rows):
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == N_QUERIES
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        assert all(r.cid != qid for r in rs)
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(abs(c) <= 1.0 + 1e-9 for c in cosines)
        assert [r.rk for r in sorted(rs, key=lambda r: r.rk)] == list(
            range(1, TOP_K + 1)
        )


def test_int8_structure_on_fixture(spark):
    _check_structure(int8_quant_topk(spark, SF).collect())


def test_matryoshka_structure_on_fixture(spark):
    _check_structure(matryoshka_topk(spark, SF).collect())


def test_planted_duplicate_ranks_first(spark, tmp_path):
    """An exact duplicate of each query vector must survive the
    quantized (resp. truncated) candidate cut and land at rank 1 with
    cosine ~1 — the property that breaks if the candidate stage drops
    true neighbors or the rescore reads the wrong vector."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N_QUERIES):
        v = rng.normal(size=64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], 0))
        rows.append((1000 + i, [float(x) for x in v], 0))  # exact dup
    for i in range(80):
        u = rng.normal(size=64)
        rows.append((2000 + i, [float(x) for x in u / np.linalg.norm(u)], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(d + "/embeddings.parquet")
    # the entry reads {sf_dir}/embeddings.parquet via load_views; give
    # it a dir with only embeddings (other tables absent is fine)
    spark._citus_views_dir = None
    try:
        for fn in (int8_quant_topk, matryoshka_topk):
            out = fn(spark, d).collect()
            top1 = {r.qid: r for r in out if r.rk == 1}
            for i in range(N_QUERIES):
                assert top1[i].cid == 1000 + i
                assert top1[i].cosine > 1.0 - 1e-9
    finally:
        spark._citus_views_dir = None


def test_lttb_anchors_and_coverage(spark):
    """LTTB must return exactly one representative per non-empty
    bucket, anchored on the series' first and last points."""
    from citus_spark.queries.analytics import _LTTB_NB, lttb_downsample

    out = lttb_downsample(spark, SF).collect()
    assert len({r.bucket for r in out}) == len(out) <= _LTTB_NB
    xs = [r.x for r in out]
    assert xs == sorted(xs)
    base = spark.sql(
        "SELECT min(unix_timestamp(ts)) AS lo, max(unix_timestamp(ts)) "
        "AS hi FROM events WHERE event_type = 'purchase'"
    ).collect()[0]
    assert out[0].x == base.lo and out[-1].x == base.hi


def test_gram_matrix_exact_and_partition_proof(spark):
    """The int-quantized Gram matrix must equal a single-threaded numpy
    computation bit-for-bit (integer sums are order-free, so any
    partitioning gives the same matrix)."""
    import numpy as np

    from citus_spark.queries.similarity import (
        _GRAM_SCALE,
        embedding_gram_matrix,
    )
    from tests.conftest import SF_SMALL

    rows = embedding_gram_matrix(spark, SF_SMALL).collect()
    emb = np.array(
        [
            r.embedding
            for r in spark.table("embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * float(_GRAM_SCALE) + 0.5).astype(np.int64)
    g = q.T @ q
    assert len(rows) == 64 * 65 // 2  # upper triangle incl. diagonal
    for r in rows:
        assert r.gram == g[r.i - 1, r.j - 1]
    diag = {r.i: r.gram for r in rows if r.i == r.j}
    assert all(v > 0 for v in diag.values())
