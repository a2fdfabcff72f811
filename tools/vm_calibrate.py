"""VM health check: is this box currently fit for performance work?

Usage:
    python tools/vm_calibrate.py [n_runs]

Runs tpch_q6 (the cheapest stable registry query) under the exact bench
protocol (bench._fresh_session -> clearCache -> noop sink), prints the
per-run times and a verdict against the historical healthy minimum.

Why this exists: this VM swings 3-10x in throughput between (and
within) sessions — tpch_q6 at sf0.1 has measured 0.2s (healthy) and
2.7-4.0s (degraded) on identical code.  Landing a plan change while
degraded orphans the bench-history minima at the current code
fingerprint (bench._history_minima only mixes identical-fingerprint
timings), so the end-of-round BENCH_r{N}.json would record raw
degraded numbers as if they were regressions.  Protocol: run this
FIRST; only do perf work / land .py changes when the verdict is
HEALTHY, and lay 3+ full bench runs at the new fingerprint afterwards
(see SCALE.md "Round-7 continuation III").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

#: healthy historical minimum for tpch_q6 at sf0.1 on this box (s);
#: single source of truth lives in bench.py so the per-run BENCH
#: calibration note and this tool can never disagree.  The floor is
#: sf-SPECIFIC — calibrate() refuses any other SPARK_GRAFT_SF_DIR
#: rather than comparing against the wrong scale (ADVICE r7).
HEALTHY_MIN = bench.VM_HEALTHY_Q6_MIN
CALIBRATED_SF_DIR_SUFFIX = "sf0.1"
#: at or below this multiple of HEALTHY_MIN, perf measurements are
#: trustworthy; above it, freeze .py files and do artifact/doc work.
HEALTHY_FACTOR = bench.VM_HEALTHY_FACTOR
#: second axis (r9): shuffle-burn floor — see bench.VM_HEALTHY_SHUFFLE_MIN.
SHUFFLE_HEALTHY_MIN = bench.VM_HEALTHY_SHUFFLE_MIN


def calibrate(n_runs: int = 4) -> tuple[list[float], float, str, str]:
    """Run the two-axis calibration probe; return
    ``(q6_runs, factor, verdict, detail)``.

    Two axes because the host degrades in (at least) two distinct
    shapes: (a) everything slow, which the scan-agg probe (tpch_q6)
    catches; (b) shuffle-heavy stages 3-10x slow while pure codegen
    runs at full speed (discovered r9 chasing dedup_ngram_jaccard) —
    caught only by the 50M-row shuffle burn.  ``factor`` is the WORST
    axis's multiple of its floor; ``detail`` is a one-line human
    summary of both axes.

    Importable so tools/close_round.py can record the same measurement
    in BENCH notes without a subprocess round-trip.
    """
    if n_runs < 1:
        raise ValueError(f"n_runs must be >= 1, got {n_runs}")
    from hbase_tohdfs_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not sf_dir.rstrip("/").endswith(CALIBRATED_SF_DIR_SUFFIX):
        raise SystemExit(
            f"vm_calibrate: HEALTHY_MIN={HEALTHY_MIN}s is calibrated for "
            f"{CALIBRATED_SF_DIR_SUFFIX} only; SPARK_GRAFT_SF_DIR={sf_dir} "
            "would produce a meaningless verdict (ADVICE r7)"
        )
    # Same precondition as bench.main(): a drifted lineitem table would
    # silently shift tpch_q6 timing and corrupt the health verdict.
    from hbase_tohdfs_spark.drift import check_or_raise

    check_or_raise()
    spark = bench._fresh_session()
    fn = REGISTRY["tpch_q6"].fn
    runs: list[float] = []
    sh_runs: list[float] = []
    try:
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        for _ in range(max(2, n_runs - 2)):
            t0 = time.perf_counter()
            spark.range(50_000_000).selectExpr(
                "id % 1000000 as k"
            ).groupBy("k").count().write.mode("overwrite").format(
                "noop"
            ).save()
            sh_runs.append(round(time.perf_counter() - t0, 3))
    finally:
        spark.stop()
    q6_factor = min(runs) / HEALTHY_MIN
    sh_factor = min(sh_runs) / SHUFFLE_HEALTHY_MIN
    factor = max(q6_factor, sh_factor)
    verdict = "HEALTHY" if factor <= HEALTHY_FACTOR else "DEGRADED"
    detail = (
        f"tpch_q6 min {min(runs):.2f}s = {q6_factor:.1f}x floor; "
        f"shuffle burn min {min(sh_runs):.2f}s = {sh_factor:.1f}x floor"
    )
    return runs, factor, verdict, detail


def main() -> None:
    try:
        n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    except ValueError:
        raise SystemExit(f"usage: vm_calibrate.py [n_runs>=1] — got {sys.argv[1]!r}")
    if n_runs < 1:
        raise SystemExit(f"usage: vm_calibrate.py [n_runs>=1] — got {n_runs}")
    runs, factor, verdict, detail = calibrate(n_runs)
    print(f"tpch_q6 runs: {runs}")
    print(f"{detail}")
    print(f"worst axis {factor:.1f}x its healthy floor -> {verdict}")
    if verdict == "DEGRADED":
        print(
            "Do NOT land .py changes or trust perf measurements now; "
            "see tools/vm_calibrate.py docstring."
        )
    sys.exit(0 if verdict == "HEALTHY" else 1)


if __name__ == "__main__":
    main()
