"""Entity resolution (record linkage) — the blocking → pairwise-score
→ transitive-clustering pipeline (Fellegi–Sunter shape, the same
three-stage structure Splink/dedupe implement) a training-data or CRM
pipeline runs to collapse near-identical records.

Scale design:

- **Blocking** bounds the candidate space: one equi-join per blocking
  key (phone prefix, name token, zip...), unioned — never an
  all-pairs comparison. Each join shuffles on its key; candidate
  volume is Σ block-size², controlled by key selectivity.
- **Scoring** is pure JVM expressions: Spark's built-in
  ``levenshtein`` per string field, normalized by the longer length,
  weighted and summed — whole-stage codegen, no Python.
- **Clustering** is the pointer-doubling connected-components
  operator (operators/components.py, O(log diameter) rounds);
  canonical representative = min id per cluster, singletons keep
  themselves.

Everything is deterministic (no sampling, unique-id tie-breaks), so
results are identical under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from citus_spark.operators.components import connected_components


def candidate_pairs(
    df: DataFrame, id_col: str, blocking: list[Column]
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b, unioned over every blocking key.
    A pair appears once even when several keys block it together."""
    out = None
    for key in blocking:
        keyed = df.select(
            F.col(id_col).alias("_id"), key.alias("_bk")
        ).filter(F.col("_bk").isNotNull())
        a, b = keyed.alias("a"), keyed.alias("b")
        pairs = a.join(
            b,
            (F.col("a._bk") == F.col("b._bk"))
            & (F.col("a._id") < F.col("b._id")),
        ).select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        out = pairs if out is None else out.unionByName(pairs)
    if out is None:
        raise ValueError("at least one blocking key is required")
    return out.distinct()


def string_similarity(a: Column, b: Column) -> Column:
    """1 - levenshtein/maxlen — in [0,1], 1.0 for identical strings,
    NULL-safe (missing field scores 0 contribution)."""
    sim = F.lit(1.0) - (
        F.levenshtein(a, b).cast("double")
        / F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double")
    )
    return F.coalesce(sim, F.lit(0.0))


def score_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    fields: dict[str, float],
) -> DataFrame:
    """Attach a weighted similarity score per candidate pair.
    `fields` maps column name → weight; weights are normalized so the
    score lands in [0, 1]."""
    total = sum(fields.values())
    cols = [id_col] + list(fields)
    left = df.select(*(F.col(c).alias(f"a_{c}") for c in cols))
    right = df.select(*(F.col(c).alias(f"b_{c}") for c in cols))
    joined = pairs.join(
        left, pairs.id_a == F.col(f"a_{id_col}")
    ).join(right, pairs.id_b == F.col(f"b_{id_col}"))
    score = None
    for c, w in fields.items():
        term = string_similarity(
            F.col(f"a_{c}").cast("string"), F.col(f"b_{c}").cast("string")
        ) * F.lit(w / total)
        score = term if score is None else score + term
    return joined.select("id_a", "id_b", score.alias("score"))


def resolve_entities(
    df: DataFrame,
    id_col: str,
    blocking: list[Column],
    fields: dict[str, float],
    threshold: float = 0.85,
) -> DataFrame:
    """Full pipeline → (id, cluster_id, is_canonical). cluster_id is
    the minimum member id (stable under any partitioning); every
    input record appears, singletons as their own cluster."""
    pairs = candidate_pairs(df, id_col, blocking)
    edges = (
        score_pairs(pairs, df, id_col, fields)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("doc_id").alias("_cid"), "component"
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comps, F.col("id") == F.col("_cid"), "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).cast("long").alias(
                "cluster_id"
            ),
        )
        .withColumn("is_canonical", F.col("cluster_id") == F.col("id"))
    )
