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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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

    # Equality first, at a slice small enough to collect: exceptAll both
    # ways over the full tiled corpus outputs.
    a = fingerprint_window(docs)
    b = fingerprint(docs)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"formulations disagree on {diff} rows"
    print("equality: OK (exceptAll both ways = 0)")

    timings: dict[str, list[float]] = {"window": [], "explode": []}
    for _ in range(reps):
        for name, fn in (("window", fingerprint_window), ("explode", fingerprint)):
            spark.catalog.clearCache()
            docs.persist()
            docs.count()
            t0 = time.perf_counter()
            fn(docs).agg(F.count(F.lit(1))).collect()
            timings[name].append(round(time.perf_counter() - t0, 2))
    wmin, emin = min(timings["window"]), min(timings["explode"])
    print(f"window : {timings['window']} min {wmin}")
    print(f"explode: {timings['explode']} min {emin}")
    print(f"ratio window/explode = {wmin / emin:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
