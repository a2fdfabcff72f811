"""Registry-window invariants.

The correctness driver checks only the FIRST 50 registry entries in dict
order, so window placement IS the evidence budget.  Round 5 replaced the
static long-green tail with a rotation computed from the committed
CORRECTNESS_r*.json history; these tests pin the protocol: never-proven
queries always sit inside the window, the tail holds the freshest
evidence, and no query's newest green row ever ages past
ceil(N / window) - 1 rounds (age 0-1 while N <= 100, 0-2 while N <= 150;
a hard cap fails loudly before the bound stretches past 2 rounds)."""

from __future__ import annotations

import math

from hbase_tohdfs_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY,
    _green_history,
    rotation_tail,
)


def _max_evidence_age() -> int:
    """Steady-state worst-case age of any query's newest green row:
    each round re-proves the window-many oldest, so ages cycle through
    0..ceil(N/w)-1."""
    return math.ceil(len(REGISTRY) / DRIVER_WINDOW) - 1


def test_every_entry_has_an_oracle():
    missing = [n for n, spec in REGISTRY.items() if spec.oracle is None]
    assert missing == [], f"oracle=None entries get only rows-only checks: {missing}"


def test_tail_matches_recomputed_rotation():
    names = list(REGISTRY)
    tail = names[DRIVER_WINDOW:]
    # registry order was produced BY the rotation, so recompute from the
    # declaration order implied by (window ++ tail) membership sets
    assert sorted(tail) == sorted(rotation_tail(names))


def test_tail_members_have_evidence_within_age_bound():
    """The rotation's steady-state guarantee: at N queries with a
    w-entry window, no query's newest green row is ever older than
    max_age = ceil(N/w) - 1 rounds (0 extra rounds of parking while
    N <= 100, 1 while N <= 150).  A tail member may therefore carry
    evidence up to max_age - 1 rounds old — parked one more round, it
    is re-proven exactly at the bound."""
    greens, max_round = _green_history()
    tail = list(REGISTRY)[DRIVER_WINDOW:]
    allowed_age = _max_evidence_age() - 1
    stale = [
        n for n in tail
        if not greens.get(n) or max_round - greens[n][-1] > allowed_age
    ]
    assert stale == [], (
        f"tail members whose newest green row is older than {allowed_age} "
        f"round(s): {stale} — their evidence would age past the "
        f"{_max_evidence_age()}-round bound while parked outside the window"
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


def test_evidence_age_stays_within_two_rounds():
    """Every query's newest green row must stay at most 2 rounds old:
    max_age = ceil(N/w) - 1 <= 2 caps the registry at 3 x DRIVER_WINDOW
    queries.  Fail loudly BEFORE an addition silently stretches the
    guarantee (the 101st query moved max_age from 1 to 2; the next wall
    is 150)."""
    assert _max_evidence_age() <= 2, (
        f"{len(REGISTRY)} queries > {3 * DRIVER_WINDOW}: evidence could age "
        f"past 2 rounds — raise the driver window or retire queries"
    )


def test_changed_queries_sit_inside_window():
    """THE code-aware guarantee (round-5 verdict item 1): any query
    whose code-closure fingerprint differs from the one its newest
    green driver row certified must be re-proven THIS round — i.e. sit
    inside the driver window, regardless of how fresh that green is."""
    from hbase_tohdfs_spark.queries import changed_since_last_green

    changed = changed_since_last_green()
    window = set(list(REGISTRY)[:DRIVER_WINDOW])
    out = sorted(changed - window)
    assert out == [], (
        f"queries with changed code parked outside the window: {out} — "
        "their green evidence certifies code that no longer exists"
    )


def test_changed_plus_nevergreen_fit_in_window():
    """Capacity guard: the forced-in set (changed + never-green) must
    fit in the window, or the rotation would silently spill some of it
    into the tail.  Fails loudly BEFORE that happens — stage rewrites
    across rounds or raise the window."""
    from hbase_tohdfs_spark.queries import (
        _green_history,
        changed_since_last_green,
    )

    greens, _ = _green_history()
    never = {n for n in REGISTRY if not greens.get(n)}
    forced = never | changed_since_last_green()
    assert len(forced) <= DRIVER_WINDOW, (
        f"{len(forced)} forced-in queries > {DRIVER_WINDOW} window slots"
    )


def test_fingerprint_record_is_current_algo():
    """The committed record must match fingerprint.ALGO, else every
    comparison silently grandfathers (load_recorded returns {})."""
    import json

    from hbase_tohdfs_spark import fingerprint as fp

    with open(fp.FINGERPRINTS_PATH) as fh:
        data = json.load(fh)
    assert data.get("_algo") == fp.ALGO
    assert fp.load_recorded(), "record present but unloadable"
