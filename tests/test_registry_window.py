"""Registry-window invariants.

The correctness driver checks only the FIRST 50 registry entries in dict
order, so window placement IS the evidence budget.  Round 5 replaced the
static long-green tail with a rotation computed from the committed
CORRECTNESS_r*.json history; these tests pin the protocol: never-proven
queries always sit inside the window, the tail holds the freshest
evidence, and no query's newest green row ever ages past
ceil(N / window) - 1 rounds in steady state (age 0-1 at N <= 100 — the
r7 bound, restored by retiring dedup_simhash).  One documented
exception: a round that CHANGES the code of fresh (age-0) queries
forces them back into the window, displacing that many fresh queries
into the tail; a displaced query's evidence transiently ages one round
past the steady-state bound (never past the 2-round hard cap) and the
rotation re-proves it first thing next round."""

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
    max_age = ceil(N/w) - 1 rounds.  A tail member may therefore carry
    evidence up to max_age - 1 rounds old — parked one more round, it
    is re-proven exactly at the bound.

    Displacement carve-out (see module docstring): every forced-in
    window member (changed code / never green) whose own raw evidence
    is fresh enough to have been parked consumes a tail slot some other
    fresh query needed.  Exactly that many tail members may sit one
    round past the steady-state allowance — never more, and never more
    than one round over."""
    from hbase_tohdfs_spark.queries import changed_since_last_green

    greens, max_round = _green_history()
    changed = changed_since_last_green()
    names = list(REGISTRY)
    window, tail = names[:DRIVER_WINDOW], names[DRIVER_WINDOW:]
    allowed_age = _max_evidence_age() - 1

    def raw_age(n):
        return max_round - greens[n][-1] if greens.get(n) else None

    stale = [
        n for n in tail
        if raw_age(n) is None or raw_age(n) > allowed_age
    ]
    displacing = [
        n for n in window
        if (n in changed or not greens.get(n))
        and (raw_age(n) is None or raw_age(n) <= allowed_age)
    ]
    over_carveout = stale[len(displacing):] if len(stale) > len(displacing) else []
    assert over_carveout == [], (
        f"{len(stale)} tail members older than {allowed_age} round(s) "
        f"({stale}) but only {len(displacing)} displaced by forced-in "
        f"window members ({displacing})"
    )
    too_old = [
        n for n in stale
        if raw_age(n) is None or raw_age(n) > allowed_age + 1
    ]
    assert too_old == [], (
        f"displaced tail members more than one round past the "
        f"steady-state allowance: {too_old}"
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
    guarantee."""
    assert _max_evidence_age() <= 2, (
        f"{len(REGISTRY)} queries > {3 * DRIVER_WINDOW}: evidence could age "
        f"past 2 rounds — raise the driver window or retire queries"
    )


def test_steady_state_age_bound_is_one():
    """r7 (judge task 2): retiring dedup_simhash returned the registry
    to <= 2 x DRIVER_WINDOW queries, so the steady-state evidence-age
    bound is back to 1 round.  Growing past 100 again requires retiring
    or swapping a query first — additions are not free."""
    assert len(REGISTRY) <= 2 * DRIVER_WINDOW, (
        f"{len(REGISTRY)} queries stretch the steady-state age bound "
        f"past 1 round — retire/swap before adding"
    )
    assert _max_evidence_age() == 1


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
