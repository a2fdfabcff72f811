"""Round-12 optimization probes.

All probes follow the repo's measurement protocol: interleaved A/B in
one session, min-of-N per side, ratio-only readings on this 3-10x-swing
host; result equality asserted where a variant could change semantics.

Subcommands:
  roundtrip_decompose  stagewise wall decomposition of pivot_kv_roundtrip
                       (scan -> encode -> unpivot -> pivot -> decode ->
                       render) so the optimization targets the stage the
                       time actually lives in.
  shj_ab               interleaved A/B of the shuffle-join strategy confs
                       (preferSortMergeJoin=false + AQE SHJ threshold) over
                       the shuffle-join-heavy registry queries; per-query
                       ratios, row-count equality asserted.

Usage: python tools/opt_probe_r12.py <probe> [sf_dir]
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_RUNS = 3


def _min_of(fn, n=N_RUNS) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return round(best, 3)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def probe_roundtrip_decompose(spark, sf_dir: str) -> dict:
    """Cumulative stage walls for the pivot_kv_roundtrip pipeline; the
    marginal cost of each stage is the delta between adjacent rows."""
    from pyspark.sql import functions as F

    from hbase_tohdfs_spark.functions import codec
    from hbase_tohdfs_spark.operators import pivot as piv
    from hbase_tohdfs_spark.operators import unpivot as unp
    from hbase_tohdfs_spark.queries import (
        _KV_ROUNDTRIP_SCHEMA,
        q_export_delimited_lines,
        q_pivot_kv_roundtrip,
        _t,
    )

    cols = ["l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus"]

    def row_key(li):
        return F.concat_ws(
            "-",
            F.lpad(F.col("l_orderkey").cast("string"), 10, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )

    def scan_only():
        li = _t(spark, sf_dir, "lineitem")
        _noop(li.select("l_orderkey", *cols))

    def encode_only():
        li = _t(spark, sf_dir, "lineitem")
        fields = {f.name: f.dataType for f in li.schema.fields}
        enc = li.select(
            row_key(li).alias("row_key"),
            *[codec.encode_as(F.col(c), fields[c]).alias(c) for c in cols],
        )
        _noop(enc)

    def cells_only():
        li = _t(spark, sf_dir, "lineitem")
        _noop(unp.typed_cells(li, row_key(li), cols))

    def pivot_binary():
        li = _t(spark, sf_dir, "lineitem")
        cells = unp.typed_cells(li, row_key(li), cols)
        _noop(piv.pivot_cells(cells, cols, drop_empty=True))

    def full_roundtrip():
        _noop(q_pivot_kv_roundtrip(spark, sf_dir))

    def export_lines():
        _noop(q_export_delimited_lines(spark, sf_dir))

    out = {"probe": "roundtrip_decompose", "sf_dir": sf_dir, "n_runs": N_RUNS}
    for name, fn in [
        ("scan_project", scan_only),
        ("plus_encode", encode_only),
        ("plus_unpivot", cells_only),
        ("plus_pivot_binary", pivot_binary),
        ("full_with_decode", full_roundtrip),
        ("export_render", export_lines),
    ]:
        out[name + "_sec"] = _min_of(fn)
    return out


#: shuffle-join-heavy registry queries for the strategy A/B (every one
#: plans at least one non-broadcast join at sf0.1).
SHJ_AB_QUERIES = [
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
    "cohort_retention",
    "users_click_purchase_sets",
    "asof_purchase_click",
]

SHJ_CONFS = {
    "spark.sql.join.preferSortMergeJoin": "false",
}


def probe_shj_ab(spark, sf_dir: str, queries=None, rounds: int = N_RUNS) -> dict:
    """Interleaved per-query A/B: planner default (SMJ preferred) vs
    preferSortMergeJoin=false (shuffled hash join allowed when its size
    conditions hold).  Row counts asserted equal per query."""
    from hbase_tohdfs_spark.queries import REGISTRY

    names = queries or SHJ_AB_QUERIES
    prev = {k: spark.conf.get(k) for k in SHJ_CONFS}
    per_query = {}
    try:
        for name in names:
            fn = REGISTRY[name].fn
            walls = {"smj": None, "shj": None}
            counts = {}
            for r in range(rounds):
                # alternate which side goes first within each round
                order = ["smj", "shj"] if r % 2 == 0 else ["shj", "smj"]
                for side in order:
                    for k, v in SHJ_CONFS.items():
                        spark.conf.set(k, v if side == "shj" else prev[k])
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    _noop(df)
                    el = time.perf_counter() - t0
                    walls[side] = el if walls[side] is None else min(walls[side], el)
                    if side not in counts:
                        counts[side] = df.count()
            assert counts["smj"] == counts["shj"], (name, counts)
            per_query[name] = {
                "smj_sec": round(walls["smj"], 3),
                "shj_sec": round(walls["shj"], 3),
                "ratio_smj_over_shj": round(walls["smj"] / walls["shj"], 3),
                "rows": counts["smj"],
            }
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    tot_a = sum(v["smj_sec"] for v in per_query.values())
    tot_b = sum(v["shj_sec"] for v in per_query.values())
    return {
        "probe": "shj_ab",
        "sf_dir": sf_dir,
        "n_runs": rounds,
        "confs": SHJ_CONFS,
        "per_query": per_query,
        "family_smj_sec": round(tot_a, 3),
        "family_shj_sec": round(tot_b, 3),
        "family_ratio": round(tot_a / tot_b, 3),
    }


def main() -> None:
    import os

    from hbase_tohdfs_spark.session import get_spark

    probe = sys.argv[1] if len(sys.argv) > 1 else "roundtrip_decompose"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if not os.environ.get("SPARK_GRAFT_LOCAL_DIR") and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-local"
    spark = get_spark(app_name=f"opt_probe_{probe}")
    spark.range(1000).selectExpr("sum(id)").collect()
    if probe == "roundtrip_decompose":
        print(json.dumps(probe_roundtrip_decompose(spark, sf_dir)))
    elif probe == "shj_ab":
        qs = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        print(json.dumps(probe_shj_ab(spark, sf_dir, qs)))
    else:
        raise SystemExit(f"unknown probe {probe!r}")
    spark.stop()


if __name__ == "__main__":
    main()
