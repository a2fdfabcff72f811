"""Scale probes for the round-5 operators: Bloom pre-filter at 50M rows,
SemDeDup at 100k vectors — the 1000x-over-gate-SF evidence runs, same
spirit as tools/scale_demo.py (50M-cell export).

Usage: python tools/scale_probe.py [bloom|semdedup|all]
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def probe_bloom(spark) -> dict:
    """50M probe rows vs a 100k-key build side: the bloom mask prunes
    map-side (no shuffle, no join); the baseline is the broadcast
    semi-join Spark would otherwise run.  Both return exact counts of
    survivors, so the bloom's extra rows are exactly its false
    positives."""
    from pyspark.sql import functions as F

    from hbase_tohdfs_spark.operators import sketch

    n_probe, n_build = 50_000_000, 100_000
    # disjoint halves + an overlap band: 50k of the build keys occur
    probe = spark.range(n_probe).selectExpr(
        "cast(id % 10000000 as string) as k"
    )
    build = spark.range(n_build).selectExpr(
        "cast(id + 9950000 as string) as k"
    )

    t0 = time.perf_counter()
    words = sketch.bloom_mask(build, "k", m_bits=1 << 20, k_hashes=3)
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_pass = probe.filter(
        sketch.bloom_contains("k", words, m_bits=1 << 20, k_hashes=3)
    ).count()
    probe_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_exact = probe.join(
        F.broadcast(build.select("k").distinct()), "k", "left_semi"
    ).count()
    join_sec = time.perf_counter() - t0

    return {
        "probe": "bloom_50M",
        "n_probe_rows": n_probe,
        "n_build_keys": n_build,
        "bloom_build_sec": round(build_sec, 2),
        "bloom_probe_sec": round(probe_sec, 2),
        "bloom_pass": n_pass,
        "exact_semijoin_sec": round(join_sec, 2),
        "exact_match": n_exact,
        "false_positives": n_pass - n_exact,
        "probe_rows_per_sec": int(n_probe / probe_sec),
    }


def probe_semdedup(spark) -> dict:
    """100k 64-dim vectors, k=256 clusters: the pairwise stage scores
    ~n^2/k pairs instead of n^2 — the measured candidate count proves
    the blocking ratio at 20x the gate corpus."""
    from pyspark.sql import functions as F

    from hbase_tohdfs_spark.operators import similarity

    n, dim, k = 100_000, 64, 256
    n_planted = 5_000  # the last 5% duplicate earlier vectors exactly
    # deterministic pseudo-embeddings: 8 latent directions + id noise,
    # with the planted tail re-deriving its source vector bit-for-bit
    emb = spark.range(n).selectExpr(
        "id as vec_id",
        f"CASE WHEN id < {n - n_planted} THEN id ELSE id - {n - n_planted}"
        " END as src",
    ).selectExpr(
        "vec_id",
        f"transform(sequence(0, {dim - 1}), d -> "
        "  cast(sin(src % 8 + d) + pmod(hash(src, d), 97) / 97.0 as double)"
        ") as embedding",
    )
    t0 = time.perf_counter()
    out = similarity.semantic_dedup(emb, k=k, iters=2, tau=0.98)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
    ).collect()[0]
    total_sec = time.perf_counter() - t0
    return {
        "probe": "semdedup_100k",
        "n_vectors": n,
        "dim": dim,
        "k_clusters": k,
        "rows_out": agg["n"],
        "n_dropped": int(agg["n_dropped"]),
        "n_planted_dups": n_planted,
        "total_sec": round(total_sec, 2),
        "pairs_without_blocking": n * (n - 1) // 2,
        "expected_pairs_with_blocking": n * (n - 1) // (2 * k),
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from hbase_tohdfs_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    if which in ("bloom", "all"):
        print(json.dumps(probe_bloom(spark)))
    if which in ("semdedup", "all"):
        print(json.dumps(probe_semdedup(spark)))


if __name__ == "__main__":
    main()
