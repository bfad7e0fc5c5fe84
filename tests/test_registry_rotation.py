"""The driver's correctness gate checks the FIRST 50 registry entries
each round; these tests pin the rotation contract (r9 verdict item #7:
assert that the staleness ordering actually puts the oldest cohort
next, instead of trusting registration order)."""

import citus_spark.queries as q


def _window(n: int = 50) -> list[str]:
    return list(q.QUERIES)[:n]


def test_every_registry_entry_is_tracked():
    # every name is either driver-verified (with a recorded round) or
    # fresh; _LAST_GREEN_ROUND and _DRIVER_VERIFIED must agree
    assert set(q._LAST_GREEN_ROUND) == set(q._DRIVER_VERIFIED)
    for name in q._DRIVER_VERIFIED:
        assert name in q.QUERIES, f"verified name {name} not registered"


def test_fresh_entries_lead_the_window():
    names = list(q.QUERIES)
    fresh = [n for n in names if n not in q._DRIVER_VERIFIED]
    # every fresh entry must sort before every verified entry
    if fresh:
        last_fresh = max(names.index(n) for n in fresh)
        first_verified = min(
            names.index(n) for n in names if n in q._DRIVER_VERIFIED
        )
        assert last_fresh < first_verified


def test_verified_entries_sort_stalest_first():
    names = list(q.QUERIES)
    rounds = [
        q._LAST_GREEN_ROUND[n] for n in names if n in q._DRIVER_VERIFIED
    ]
    assert rounds == sorted(rounds), (
        "verified entries must re-enter the window oldest-green first"
    )


def test_r10_window_reaches_the_r2_cohort():
    # the r9 verdict's concrete demand: after rotating the r9 greens,
    # the next 50-entry window must reach the round-2 cohort (TPC-H
    # among them). Guard: ≥30 r2-or-older names inside the window —
    # which also caps fresh additions this round at ~11.
    win = _window()
    old = [n for n in win if q._LAST_GREEN_ROUND.get(n, 99) <= 2]
    assert len(old) >= 30, (
        f"only {len(old)} r≤2-cohort names in the verify window; "
        f"window head: {win[:15]}"
    )


def test_later_rounds_overwrite_earlier_ones():
    # window_rank was green in r1 AND re-verified in r9; the map must
    # record the LATEST green so it doesn't hog a window slot
    assert q._LAST_GREEN_ROUND["window_rank"] == 9
    # tpch_q1 has not been driver-checked since r2 — stalest cohort
    assert q._LAST_GREEN_ROUND["tpch_q1"] == 2
