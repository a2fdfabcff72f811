"""Compare two fingerprint-matched bench pools from BENCH_HISTORY.jsonl.

Usage:
    python tools/pool_compare.py FP_A FP_B [--changed q1,q2,...]

Prints per-query minima ratios (B over A), split into the
``--changed`` set (queries whose code closure changed between the
pools — read their ratios as candidate code effects) and the rest
(behavior-identical controls — their spread is this pool pair's
sampling-noise bound; a "changed" ratio inside the control spread is
NOT evidence of a code effect).  Also prints each pool's per-run
tpch_q6/shuffle context so floor-matched comparisons are explicit.

This automates the close-out analysis SCALE.md rounds 10-12 did by
hand; the attribution rules are the ones the r10-r12 verdicts
accepted (uniform shifts on frozen code = host; adjacency-valid
interleaved A/Bs outrank pool deltas).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

HISTORY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_HISTORY.jsonl")


def load_pool(prefix: str) -> list[dict]:
    runs = []
    with open(HISTORY) as fh:
        for line in fh:
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if (d.get("code_fp") or "").startswith(prefix):
                runs.append(d)
    return runs


def minima(pool: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for d in pool:
        for q, v in d.get("queries", {}).items():
            out[q] = min(out.get(q, float("inf")), v)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("fp_a", help="baseline pool fingerprint (prefix ok)")
    ap.add_argument("fp_b", help="comparison pool fingerprint (prefix ok)")
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated queries whose code closure changed "
        "between the pools (default: none)",
    )
    args = ap.parse_args()

    pool_a, pool_b = load_pool(args.fp_a), load_pool(args.fp_b)
    if not pool_a or not pool_b:
        print(f"pool sizes: A={len(pool_a)} B={len(pool_b)} — need both nonempty")
        return 1
    min_a, min_b = minima(pool_a), minima(pool_b)
    common = sorted(set(min_a) & set(min_b))
    changed = [q for q in args.changed.split(",") if q] if args.changed else []
    missing = [q for q in changed if q not in common]
    if missing:
        print(f"WARNING: --changed queries not in both pools: {missing}")
    changed = [q for q in changed if q in common]
    controls = [q for q in common if q not in changed]

    print(f"pool A ({args.fp_a}): {len(pool_a)} runs; pool B ({args.fp_b}): {len(pool_b)} runs; {len(common)} common queries")
    for name, pool in (("A", pool_a), ("B", pool_b)):
        ctx = [
            f"q6={d['queries'].get('tpch_q6', float('nan')):.2f}" for d in pool
        ]
        print(f"  {name} per-run q6: {' '.join(ctx)}")

    def report(queries: list[str], label: str) -> None:
        if not queries:
            print(f"\n{label}: (none)")
            return
        ratios = sorted(
            ((min_b[q] / min_a[q], q) for q in queries), reverse=True
        )
        tot_a = sum(min_a[q] for q in queries)
        tot_b = sum(min_b[q] for q in queries)
        med = statistics.median(r for r, _ in ratios)
        print(
            f"\n{label} ({len(queries)}): total {tot_a:.2f}s -> {tot_b:.2f}s"
            f" = {tot_b / tot_a:.2f}x, median {med:.2f}"
        )
        for r, q in ratios[:8]:
            print(f"  {q}: {min_a[q]:.2f} -> {min_b[q]:.2f} = {r:.2f}x")
        if len(ratios) > 8:
            print(f"  ... ({len(ratios) - 8} more)")

    report(controls, "behavior-identical controls (noise bound)")
    report(changed, "changed-code queries (candidate effects)")
    if changed and controls:
        noise_hi = sorted(min_b[q] / min_a[q] for q in controls)[
            int(0.95 * (len(controls) - 1))
        ]
        print(
            f"\ncontrol 95th-pct ratio = {noise_hi:.2f}x — changed-code "
            "ratios at or under this are inside the pool pair's noise; "
            "use an interleaved A/B to resolve anything above it"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
