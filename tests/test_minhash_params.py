"""Parameterized MinHash-LSH: recall at production parameters.

Fully deterministic — the corpus is seeded and the signature pipeline
is hash-based (no rand()), so recall is a fixed number, not a flaky
sample.
"""

import random

from citus_spark.operators.minhash import lsh_candidate_pairs


def _corpus():
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    planted = []
    for i in range(30):
        toks = [rng.choice(vocab) for _ in range(50)]
        base_id, var_id = i, 1000 + i
        variant = list(toks)
        variant[rng.randrange(50)] = rng.choice(vocab)  # 1-token edit
        docs.append((base_id, " ".join(toks)))
        docs.append((var_id, " ".join(variant)))
        planted.append((base_id, var_id))
    for i in range(40):  # unrelated noise docs
        docs.append((2000 + i, " ".join(rng.choice(vocab) for _ in range(50))))
    return docs, planted


def _jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_recall_at_128_perms(spark):
    docs, planted = _corpus()
    text = dict(docs)
    # premise: planted pairs really are near-dups at the S-curve knee
    planted_hi = [
        (a, b) for a, b in planted if _jaccard(text[a], text[b]) >= 0.8
    ]
    assert len(planted_hi) >= 25, "corpus should plant high-overlap pairs"

    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            df, n_perms=128, n_bands=16, shingle_k=3
        ).collect()
    }
    found = sum(1 for p in planted_hi if p in pairs)
    recall = found / len(planted_hi)
    assert recall >= 0.9, f"recall {recall:.2f} ({found}/{len(planted_hi)})"


def test_bands_must_divide_perms(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lsh_candidate_pairs(df, n_perms=10, n_bands=3)
