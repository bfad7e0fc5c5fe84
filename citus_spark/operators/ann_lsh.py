"""Multi-table random-hyperplane LSH for ANN — the production recall
pattern.

One hyperplane table with b sign bits finds a cosine-c neighbor with
probability (1 - acos(c)/pi)^b — e.g. ~0.25 per 6-bit table at
c = 0.8. Production setups therefore UNION n_tables independent
tables: recall = 1 - (1 - p)^n_tables, tunable to any target without
growing any single bucket. This module parameterizes both dials
(`n_planes`, `n_tables`) over the same banded-join shape as the
MinHash dedup path (operators/minhash.py — its n_bands/n_perms play
the identical role for Jaccard).

Scale shape: bucketing is one GEMM per Arrow batch (embarrassingly
parallel, no shuffle); candidates shuffle only by (table, bucket) —
never all-pairs; the exact rescore touches only surviving pairs.
Planes are derived from a seeded RNG, so every executor regenerates
the same matrix — nothing is shipped but the seed.

↔ reference: no ANN surface exists in Citus (extension territory per
SURVEY §2.3); the *distribution* pattern mirrors its banded
repartition joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from citus_spark.functions import dot_fold_sql


def _planes(dim: int, n_planes: int, n_tables: int, seed: int):
    """Deterministic ±1 hyperplane matrix (dim × n_tables·n_planes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(dim, n_tables * n_planes)) * 2.0 - 1.0


def lsh_bucket_table(
    emb: DataFrame,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, tbl, bucket): each vector's bucket in each of the
    `n_tables` independent hyperplane tables. One GEMM per Arrow
    batch computes every table's sign bits at once."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        planes = None
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if planes is None:
                planes = _planes(mat.shape[1], n_planes, n_tables, seed)
            signs = (mat @ planes) > 0  # (batch × n_tables·n_planes)
            bits = signs.reshape(len(mat), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # (batch × n_tables)
            ids = pdf[id_col].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "bucket": buckets.ravel().astype(np.int64),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="id long, tbl int, bucket long"
    )


def lsh_ann_candidates(
    emb: DataFrame,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int | None = None,
) -> DataFrame:
    """Distinct (qid, cid) candidate pairs that share a bucket in ANY
    table. `query_ids_below` restricts the probe side (bounded query
    set); None = all-vs-all near-dup mode (qid < cid)."""
    b = lsh_bucket_table(emb, n_planes, n_tables, seed, id_col, vec_col)
    b = b.persist()  # pin one bucketing for both sides of the join
    probe = b.withColumnRenamed("id", "qid")
    if query_ids_below is not None:
        probe = probe.filter(F.col("qid") < query_ids_below)
        cond = F.col("qid") != F.col("cid")
    else:
        cond = F.col("qid") < F.col("cid")
    cand = b.withColumnRenamed("id", "cid")
    return (
        probe.join(cand, ["tbl", "bucket"])
        .filter(cond)
        .select("qid", "cid")
        .distinct()
    )


def lsh_ann_topk(
    emb: DataFrame,
    n_queries: int,
    top_k: int,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: multi-table candidates + exact
    rescore of survivors (the same two-stage shape as the brute GEMM
    path, with stage 1 sublinear)."""
    cand = lsh_ann_candidates(
        emb, n_planes, n_tables, seed, id_col, vec_col,
        query_ids_below=n_queries,
    )
    vecs = emb.select(F.col(id_col), F.col(vec_col))
    qv = vecs.withColumnRenamed(id_col, "qid").withColumnRenamed(vec_col, "qv")
    cv = vecs.withColumnRenamed(id_col, "cid").withColumnRenamed(vec_col, "cv")
    dot = F.expr(dot_fold_sql("qv", "cv"))
    qn = F.sqrt(F.expr(dot_fold_sql("qv", "qv")))
    cn = F.sqrt(F.expr(dot_fold_sql("cv", "cv")))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select("qid", "cid", (dot / (qn * cn)).alias("cosine"))
    )
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= top_k)
        .select("qid", "cid", "cosine", F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )
