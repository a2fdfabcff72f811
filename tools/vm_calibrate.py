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

#: healthy historical minimum for tpch_q6 at sf0.1 on this box (s).
HEALTHY_MIN = 0.20
#: at or below this multiple of HEALTHY_MIN, perf measurements are
#: trustworthy; above it, freeze .py files and do artifact/doc work.
HEALTHY_FACTOR = 1.75


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import bench
    from hbase_tohdfs_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench._fresh_session()
    fn = REGISTRY["tpch_q6"].fn
    runs: list[float] = []
    try:
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
    finally:
        spark.stop()
    best = min(runs)
    factor = best / HEALTHY_MIN
    verdict = "HEALTHY" if factor <= HEALTHY_FACTOR else "DEGRADED"
    print(f"tpch_q6 runs: {runs}")
    print(
        f"min {best:.2f}s = {factor:.1f}x the healthy floor "
        f"({HEALTHY_MIN:.2f}s) -> {verdict}"
    )
    if verdict == "DEGRADED":
        print(
            "Do NOT land .py changes or trust perf measurements now; "
            "see tools/vm_calibrate.py docstring."
        )
    sys.exit(0 if verdict == "HEALTHY" else 1)


if __name__ == "__main__":
    main()
