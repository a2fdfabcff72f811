"""Same-session interleaved A/B: winnowing fingerprint, window-function
formulation vs explode->groupBy (r7 verdict task 3).

The VM swings 3-10x between sessions, so only interleaved same-session
ratios are trustworthy.  Corpus = the sf0.1 documents table tiled to
--n-docs (the scale_probe recipe, incl. the repartition that keeps the
map stage off a single core).  Also asserts the two formulations agree
exactly before timing anything.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import DataFrame, Window


def fingerprint_window(docs: DataFrame, k: int = 3, window: int = 4) -> DataFrame:
    """The pre-r8 window-function formulation (A side) — hash updated to
    the shipped 60-bit BIGINT so the equality check stays type-valid.

    History: with md5 STRING hashes both formulations measured identical
    (0.97x at 1M, 0.98x at 4M) because min(string) forced SortAggregate
    in the explode form too; the BIGINT switch is what unlocked the
    hash-agg plan."""
    from hbase_tohdfs_spark.operators.text import explode_shingles, shingle_docs

    exploded = explode_shingles(shingle_docs(docs, k))
    hashed = exploded.select(
        "doc_id",
        "pos",
        F.expr(
            "cast(conv(substr(md5(shingle), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    fps = hashed.select("doc_id", F.min("h").over(w).alias("fp")).distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


def main() -> None:
    args = sys.argv[1:]
    mode = "window"
    if args and args[0] == "poly":
        mode = "poly"
        args = args[1:]
    n_docs = int(args[0]) if args else 1_000_000
    reps = int(args[1]) if len(args) > 1 else 3

    import bench
    from hbase_tohdfs_spark.operators.text import fingerprint

    spark = bench._fresh_session()
    base = spark.read.option("pathGlobFilter", "documents.parquet").parquet(
        "/root/testdata/sf0.1"
    )
    n_base = base.count()
    k = max(1, n_docs // n_base)
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("doc_id", F.col("doc_id") * k + F.col("rep"))
        .drop("rep")
        .repartition(64)
        .persist()
    )
    n = docs.count()
    print(f"corpus: {n} docs")

    if mode == "poly":
        # r8 verdict task 2: md5-per-shingle vs rolling polynomial over
        # per-token hashes.  The two hash FAMILIES emit different values
        # by design, so equality here = same doc set (every doc with
        # >= k tokens appears in both); the poly family's value-level
        # correctness is pinned by the DuckDB replay test
        # (test_text_ops.py) and, once shipped, the registry oracle.
        a_fn = lambda d: fingerprint(d)  # noqa: E731
        b_fn = lambda d: fingerprint(d, shingle_hash="poly")  # noqa: E731
        a_name, b_name = "md5", "poly"
        ids_a = a_fn(docs).select("doc_id")
        ids_b = b_fn(docs).select("doc_id")
        diff = ids_a.exceptAll(ids_b).count() + ids_b.exceptAll(ids_a).count()
        assert diff == 0, f"doc sets disagree on {diff} rows"
        print("doc-set equality: OK (exceptAll both ways = 0)")
    else:
        # Equality first, at a slice small enough to collect: exceptAll
        # both ways over the full tiled corpus outputs.
        a_fn, b_fn = fingerprint_window, fingerprint
        a_name, b_name = "window", "explode"
        a = a_fn(docs)
        b = b_fn(docs)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, f"formulations disagree on {diff} rows"
        print("equality: OK (exceptAll both ways = 0)")

    timings: dict[str, list[float]] = {a_name: [], b_name: []}
    for _ in range(reps):
        for name, fn in ((a_name, a_fn), (b_name, b_fn)):
            spark.catalog.clearCache()
            docs.persist()
            docs.count()
            t0 = time.perf_counter()
            fn(docs).agg(F.count(F.lit(1))).collect()
            timings[name].append(round(time.perf_counter() - t0, 2))
    amin, bmin = min(timings[a_name]), min(timings[b_name])
    print(f"{a_name}: {timings[a_name]} min {amin}")
    print(f"{b_name}: {timings[b_name]} min {bmin}")
    print(f"ratio {a_name}/{b_name} = {amin / bmin:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
