"""Entity resolution: planted typo'd duplicates must cluster with
their originals, distinct entities must not merge, every record must
appear exactly once, and results must be identical under any
partitioning (deterministic pipeline)."""

from pyspark.sql import functions as F

from citus_spark.operators.entity_resolution import (
    candidate_pairs,
    resolve_entities,
    score_pairs,
)


def _people(spark):
    rows = [
        # (id, name, phone, city) — pairs (1,101), (2,102), (3,103)
        # are the same person with typos; 1..9 are distinct people
        (1, "alice johnson", "555-0101", "springfield"),
        (101, "alice jonson", "555-0101", "springfield"),
        (2, "robert miller", "555-0202", "shelbyville"),
        (102, "robert milller", "555-0202", "shelbyville"),
        (3, "carol de la cruz", "555-0303", "ogdenville"),
        (103, "carol de la crus", "555-0303", "ogdenvile"),
        (4, "dave smith", "555-0404", "springfield"),
        (5, "erin smith", "555-0505", "springfield"),
        (6, "frank wright", "555-0606", "shelbyville"),
        (7, "grace hopper", "555-0707", "arlington"),
        (8, "heinz doofen", "555-0808", "danville"),
        (9, "alice wright", "555-0909", "springfield"),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, phone string, city string"
    )


def _blocking():
    return [F.col("phone"), F.substring(F.col("name"), 1, 4)]


FIELDS = {"name": 2.0, "city": 1.0}


def test_planted_duplicates_cluster(spark):
    df = _people(spark)
    out = resolve_entities(df, "id", _blocking(), FIELDS, threshold=0.85)
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 12  # every record exactly once
    for a, b in ((1, 101), (2, 102), (3, 103)):
        assert rows[a].cluster_id == rows[b].cluster_id == a
        assert rows[a].is_canonical and not rows[b].is_canonical
    # distinct people stay singletons (incl. same-city same-prefix
    # near-misses like dave/erin smith and the two alices)
    for i in (4, 5, 6, 7, 8, 9):
        assert rows[i].cluster_id == i and rows[i].is_canonical


def test_blocking_bounds_pairs_and_dedups(spark):
    df = _people(spark)
    pairs = candidate_pairs(df, "id", _blocking()).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # phone blocks the three planted pairs; name-prefix blocks the
    # alices and smith-family prefixes etc. — but never all 66 pairs
    assert {(1, 101), (2, 102), (3, 103)} <= got
    assert len(got) < 20
    assert all(a < b for a, b in got)
    assert len(got) == len(pairs)  # distinct


def test_scores_bounded_and_symmetric_fields(spark):
    df = _people(spark)
    pairs = candidate_pairs(df, "id", _blocking())
    scored = score_pairs(pairs, df, "id", FIELDS).collect()
    assert all(0.0 <= r.score <= 1.0 + 1e-12 for r in scored)
    by_pair = {(r.id_a, r.id_b): r.score for r in scored}
    assert by_pair[(1, 101)] > 0.9  # one-char typo, same city


def test_partitioning_invariance(spark):
    df = _people(spark)
    one = resolve_entities(df, "id", _blocking(), FIELDS).collect()
    many = resolve_entities(
        df.repartition(7, "city"), "id", _blocking(), FIELDS
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
