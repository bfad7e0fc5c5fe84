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


def test_r11_window_advances_to_the_r3_cohort():
    # the r10 verdict's concrete demand: after rotating the r10 greens,
    # the verify window must ADVANCE — the r1 cohort and the bulk of the
    # r2 cohort were re-proven in r10, so the window must now be the 11
    # never-re-verified r2 TPC-H names + ≥30 r3-cohort names, not a
    # re-run of the same r1/r2 set.
    win = _window()
    r3 = [n for n in win if q._LAST_GREEN_ROUND.get(n, 99) == 3]
    assert len(r3) >= 30, (
        f"only {len(r3)} r3-cohort names in the verify window; "
        f"window head: {win[:15]}"
    )
    # nothing re-verified in r10 may occupy a window slot while any
    # staler verified cohort exists outside the window
    r10_in_window = [n for n in win if q._LAST_GREEN_ROUND.get(n) == 10]
    assert not r10_in_window, (
        f"freshly-verified r10 names back in the window: {r10_in_window}"
    )


def test_window_oldest_cohort_advances_each_round():
    # generic form of the advance check (r10 verdict item #1): the
    # stalest verified cohort IN the window must be the stalest
    # verified cohort in the REGISTRY — i.e. the window always chews
    # through the oldest greens first, so each round's rotation moves
    # the frontier instead of re-proving an already-fresh cohort.
    win = _window()
    verified_in_window = [
        q._LAST_GREEN_ROUND[n] for n in win if n in q._DRIVER_VERIFIED
    ]
    all_verified = [
        q._LAST_GREEN_ROUND[n] for n in q.QUERIES if n in q._DRIVER_VERIFIED
    ]
    if verified_in_window:
        assert min(verified_in_window) == min(all_verified), (
            "window skips the registry's stalest verified cohort"
        )


def test_later_rounds_overwrite_earlier_ones():
    # window_rank was green in r1 AND re-verified in r9; the map must
    # record the LATEST green so it doesn't hog a window slot
    assert q._LAST_GREEN_ROUND["window_rank"] == 9
    # tpch_q1 was re-proven in the r10 window; tpch_q2 was not — it is
    # now among the stalest (r2) cohort leading the r11 window
    assert q._LAST_GREEN_ROUND["tpch_q1"] == 10
    assert q._LAST_GREEN_ROUND["tpch_q2"] == 2
