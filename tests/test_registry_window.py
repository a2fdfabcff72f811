"""Registry-window invariants.

The correctness driver checks only the FIRST 50 registry entries in dict
order, so window placement IS the evidence budget.  Round 5 replaced the
static long-green tail with a rotation computed from the committed
CORRECTNESS_r*.json history; these tests pin the protocol: the tail holds
only queries whose newest green row is from the most recent round, and
anything never proven green sits inside the window."""

from __future__ import annotations

from hbase_tohdfs_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY,
    _green_history,
    rotation_tail,
)


def test_every_entry_has_an_oracle():
    missing = [n for n, spec in REGISTRY.items() if spec.oracle is None]
    assert missing == [], f"oracle=None entries get only rows-only checks: {missing}"


def test_tail_matches_recomputed_rotation():
    names = list(REGISTRY)
    tail = names[DRIVER_WINDOW:]
    # registry order was produced BY the rotation, so recompute from the
    # declaration order implied by (window ++ tail) membership sets
    assert sorted(tail) == sorted(rotation_tail(names))


def test_tail_members_have_fresh_green_evidence():
    greens, max_round = _green_history()
    tail = list(REGISTRY)[DRIVER_WINDOW:]
    stale = [
        n for n in tail
        if not greens.get(n) or max_round - greens[n][-1] > 0
    ]
    assert stale == [], (
        f"tail members without a current-round green row: {stale} — their "
        f"evidence would age past one round while parked outside the window"
    )


def test_never_green_queries_sit_inside_window():
    greens, _ = _green_history()
    window = list(REGISTRY)[:DRIVER_WINDOW]
    unproven = [n for n in REGISTRY if not greens.get(n)]
    out = [n for n in unproven if n not in window]
    assert out == [], f"never-proven queries outside the driver window: {out}"


def test_window_is_exactly_the_driver_budget():
    assert len(REGISTRY) >= DRIVER_WINDOW
    assert len(list(REGISTRY)[DRIVER_WINDOW:]) == len(REGISTRY) - DRIVER_WINDOW


def test_bench_queries_exist():
    from bench import BENCH_QUERIES

    assert all(n in REGISTRY for n in BENCH_QUERIES)


def test_registry_fits_two_round_rotation():
    """With a 50-entry window, the no-green-row-older-than-one-round
    invariant is satisfiable only while the registry holds at most
    2 x DRIVER_WINDOW queries (window covers half the registry per
    round).  Fail loudly BEFORE an addition silently makes the
    guarantee impossible."""
    assert len(REGISTRY) <= 2 * DRIVER_WINDOW, (
        f"{len(REGISTRY)} queries > {2 * DRIVER_WINDOW}: the rotation can "
        "no longer refresh every query's green row within one round — "
        "either raise the driver window or retire queries"
    )
