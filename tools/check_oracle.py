"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark at a scale factor and its
``oracle_sql()`` twin in DuckDB over the same parquet tables, then compares
row count, column names, and sorted values.  Exact comparison, with a
float report (max abs delta) so rounding issues are visible before the
driver sees them.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def compare(name, spark_df, con, oracle_sql):
    sdf = spark_df.toPandas()
    odf = con.execute(oracle_sql).df()
    problems = []
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    s_rows = sorted(
        [tuple(normalize(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=str,
    )
    o_rows = sorted(
        [tuple(normalize(v) for v in row) for row in odf[o_cols].itertuples(index=False)],
        key=str,
    )
    mism = 0
    max_float_delta = 0.0
    for a, b in zip(s_rows, o_rows):
        if a != b:
            exact_bad = False
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    d = abs(x - y)
                    max_float_delta = max(max_float_delta, d)
                    if d > 1e-9:
                        exact_bad = True
                elif x != y:
                    exact_bad = True
            if exact_bad:
                mism += 1
                if mism <= 3:
                    problems.append(f"row mismatch:\n  spark : {a}\n  oracle: {b}")
    if mism:
        problems.append(f"{mism} mismatching rows (of {len(s_rows)})")
    if max_float_delta:
        problems.append(f"note: max float delta {max_float_delta:.2e}")
    return [p for p in problems if not p.startswith("note:") or mism]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hbase_tohdfs_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"[rows-only] {name}: {n} rows")
                continue
            problems = compare(name, df, con, oracles[name])
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if problems:
            failed.append(name)
            print(f"[FAIL] {name}")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"[ok]   {name}")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
