"""Generator invariants + DuckDB oracle equivalence."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hbase_tohdfs_spark.generate import populate_cells, populate_cells_oracle_sql


def test_shape_and_counts(spark):
    cells = populate_cells(spark, num_tasks=3, records_per_task=50, run_id="r1")
    assert cells.count() == 3 * 50 * 10
    quals = {r[0] for r in cells.select("qualifier").distinct().collect()}
    assert quals == {f"C{i}" for i in range(10)}
    # ts is a unique monotone sequence
    assert cells.select("ts").distinct().count() == 1500


def test_rowkey_format(spark):
    cells = populate_cells(spark, 2, 10, "runX")
    ks = [r[0] for r in cells.select("row_key").distinct().collect()]
    for k in ks:
        root, run, task = k.split("|")
        assert len(root) == 5 and root.isdigit() and int(root) < 32768
        assert run == "runX"
        assert task in ("0", "1")


def test_matches_duckdb_oracle(spark):
    cells = populate_cells(spark, 2, 25, "o")
    got = {
        (r["row_key"], r["qualifier"], bytes(r["value"]).decode(), r["ts"])
        for r in cells.collect()
    }
    oracle = duckdb.sql(populate_cells_oracle_sql(2, 25, "o")).fetchall()
    want = {(r[0], r[2], r[3], r[4]) for r in oracle}
    assert got == want


def test_deterministic_across_runs(spark):
    a = populate_cells(spark, 2, 20, "d").collect()
    b = populate_cells(spark, 2, 20, "d").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
