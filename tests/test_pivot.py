"""Pivot operator semantics (SURVEY.md §2.2, intended semantics not bugs B1-B4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_tohdfs_spark.model import CELL_SCHEMA, parse_avro_schema_json
from hbase_tohdfs_spark.operators.pivot import (
    pivot_cells,
    pivot_typed,
    render_delimited,
)


def _cells(spark, rows):
    return spark.createDataFrame(
        [
            (rk, cf, q, v.encode() if isinstance(v, str) else v, ts)
            for (rk, cf, q, v, ts) in rows
        ],
        CELL_SCHEMA,
    )


def test_pivot_basic_group_and_project(spark):
    cells = _cells(
        spark,
        [
            ("r1", "c", "C1", "a", 1),
            ("r1", "c", "C2", "dropme", 2),  # not in schema -> dropped (P3)
            ("r1", "c", "C3", "b", 3),
            ("r2", "c", "C1", "x", 4),
        ],
    )
    wide = pivot_cells(cells, ["C1", "C3"])
    rows = {r["row_key"]: r for r in wide.collect()}
    assert set(rows) == {"r1", "r2"}
    assert bytes(rows["r1"]["C1"]) == b"a"
    assert bytes(rows["r1"]["C3"]) == b"b"
    assert rows["r2"]["C3"] is None
    assert wide.columns == ["row_key", "C1", "C3"]


def test_last_write_wins_deterministic(spark):
    cells = _cells(
        spark,
        [
            ("r1", "c", "C1", "old", 1),
            ("r1", "c", "C1", "new", 9),
            ("r1", "c", "C1", "mid", 5),
        ],
    )
    wide = pivot_cells(cells, ["C1"])
    assert bytes(wide.collect()[0]["C1"]) == b"new"


def test_final_group_not_dropped(spark):
    # Reference bug B2: Avro export drops the trailing group. We must not.
    cells = _cells(spark, [("zzz-last", "c", "C1", "v", 1)])
    wide = pivot_cells(cells, ["C1"], drop_empty=True)
    assert wide.count() == 1


def test_empty_row_guard_avro_vs_text(spark):
    # A row whose only qualifiers are outside the schema: text keeps it
    # (all-empty line), avro/parquet drop it (ExportHBaseTableToAvro.java:175).
    cells = _cells(
        spark,
        [("r1", "c", "C9", "only-undeclared", 1), ("r2", "c", "C1", "v", 2)],
    )
    kept = pivot_cells(cells, ["C1"], drop_empty=False)
    dropped = pivot_cells(cells, ["C1"], drop_empty=True)
    # r1 has no C1 cell at all -> it never reaches the pivot (filtered with
    # the projection), matching text output of the *intended* semantics
    # only when the row has at least one declared qualifier.
    assert {r["row_key"] for r in dropped.collect()} == {"r2"}
    assert kept.count() == dropped.count() == 1


def test_virtual_rowkey_column(spark):
    cells = _cells(
        spark,
        [
            ("r1", "c", "C1", "v", 1),  # no 'rowkey' cell -> filled from key
            ("r2", "c", "C1", "w", 2),
            ("r2", "c", "rowkey", "explicit", 3),  # cell wins over key
        ],
    )
    wide = pivot_cells(cells, ["rowkey", "C1"], row_key_col="rowkey")
    rows = {r["row_key"]: r for r in wide.collect()}
    assert bytes(rows["r1"]["rowkey"]) == b"r1"
    assert bytes(rows["r2"]["rowkey"]) == b"explicit"


def test_column_family_pruning(spark):
    cells = _cells(
        spark,
        [("r1", "c", "C1", "keep", 1), ("r1", "other", "C1", "drop", 9)],
    )
    wide = pivot_cells(cells, ["C1"], column_family="c")
    assert bytes(wide.collect()[0]["C1"]) == b"keep"


def test_delimited_rendering_nulls_as_empty(spark):
    cells = _cells(spark, [("r1", "c", "C1", "a", 1)])
    wide = pivot_cells(cells, ["C1", "C3", "C4"])
    lines = render_delimited(wide, ["C1", "C3", "C4"], "|").collect()
    assert lines[0]["line"] == "a||"


def test_pivot_typed_decode(spark):
    import struct

    schema = parse_avro_schema_json(
        '{"type":"record","name":"T","fields":['
        '{"name":"s","type":"string"},'
        '{"name":"i","type":"int"},'
        '{"name":"l","type":"long"}]}'
    )
    cells = _cells(
        spark,
        [
            ("r1", "c", "s", "hello", 1),
            ("r1", "c", "i", struct.pack(">i", -42), 2),
            ("r1", "c", "l", struct.pack(">q", -(2**40) - 7), 3),
        ],
    )
    row = pivot_typed(cells, schema).collect()[0]
    assert row["s"] == "hello"
    assert row["i"] == -42
    assert row["l"] == -(2**40) - 7


def test_empty_input_no_error(spark):
    # Reference bug B4: NPE on empty input. We must return an empty frame.
    empty = spark.createDataFrame([], CELL_SCHEMA)
    assert pivot_cells(empty, ["C1"]).count() == 0
