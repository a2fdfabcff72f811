"""The core relational operator: pivot narrow KV cells into wide rows.

Reference semantics (SURVEY.md §2.2): accumulate ``qualifier -> value`` per
row key, flush one wide row per key (``ExportHBaseTableToDelimiteredTxt.
java:148-164``); later cells within a row overwrite earlier ones
(last-write-wins, the ``HashMap.put`` at ``…Txt.java:159-163``); only
schema columns survive, in schema order (``…Txt.java:171-182``); an
optional virtual row-key column materializes the key itself when no cell
provides it (``…Txt.java:179-181``).

We implement the *intended* semantics, not the reference's bugs B1-B4
(SURVEY.md §2.8): grouping is by actual row key, the last group is never
dropped, and last-write-wins is made deterministic by the explicit ``ts``
cell timestamp (``max_by(value, ts)``) instead of scan order.

Scale notes (100 TB posture):
* The qualifier list is always explicit (the reference requires a schema
  file too, ``…Txt.java:109``), so Spark's ``pivot`` skips its
  distinct-values discovery job — no extra full scan.
* ``groupBy(row_key).pivot(...)`` is a single hash aggregate with map-side
  partial aggregation: one shuffle keyed on ``row_key``.  If the KV dataset
  is stored bucketed/range-partitioned by ``row_key`` (see ``table.py``),
  Catalyst reuses the child distribution and the exchange disappears —
  the analogue of the reference's map-only, zero-shuffle export
  (``setNumReduceTasks(0)``, ``…Txt.java:85``).
* Row-key skew (one huge row) is bounded by the qualifier domain: the
  aggregate state per key is one value per schema column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_tohdfs_spark.functions import codec
from hbase_tohdfs_spark.model import ExportSchema


def last_write_wins(value_col: str = "value", ts_col: str = "ts") -> Column:
    """Deterministic duplicate-qualifier resolution (SURVEY §2.2 P2).

    ``max_by(value, ts)`` — the cell with the greatest timestamp wins,
    replacing the reference's scan-order-dependent ``HashMap.put``.
    Callers must guarantee ``ts`` is unique per ``(row_key, qualifier)``
    (the generator emits a monotone sequence) or ties are arbitrary.
    """
    return F.max_by(value_col, ts_col)


def pivot_cells(
    cells: DataFrame,
    columns: list[str],
    row_key_col: str | None = None,
    column_family: str | None = None,
    drop_empty: bool = False,
) -> DataFrame:
    """Pivot ``(row_key, cf, qualifier, value, ts)`` cells to wide rows.

    Output columns: ``row_key`` followed by ``columns`` in order, each the
    last-written binary cell value (NULL when the row has no such cell).

    ``column_family``: server-side family pruning analogue
    (``scan.addFamily``, ``…Txt.java:73``) — a plain filter that Parquet
    row-group stats / partition pruning push down.

    ``row_key_col``: the virtual row-key column (P4) — if it names one of
    ``columns``, rows missing that cell get the row key itself (UTF-8
    bytes, consistent with the text path's ``Bytes.toString`` round-trip).

    ``drop_empty``: suppress rows with no surviving cells — the
    Avro/Parquet guard (``ExportHBaseTableToAvro.java:175``); text/seq
    exports keep such rows (no guard in ``…Txt.java:166-186``).
    """
    if column_family is not None:
        cells = cells.filter(F.col("cf") == column_family)
    # Explicit value list -> no distinct-discovery job; qualifiers not in
    # the schema are dropped here (projection P3) *before* the shuffle,
    # shrinking shuffle volume to schema columns only.
    cells = cells.filter(F.col("qualifier").isin(columns))
    wide = (
        cells.groupBy("row_key")
        .pivot("qualifier", columns)
        .agg(last_write_wins("value", "ts"))
    )
    if drop_empty:
        data_cols = [c for c in columns]
        wide = wide.dropna(how="all", subset=data_cols)
    if row_key_col is not None and row_key_col in columns:
        wide = wide.withColumn(
            row_key_col,
            F.coalesce(F.col(row_key_col), F.col("row_key").cast("binary")),
        )
    return wide.select("row_key", *columns)


def decode_wide(wide: DataFrame, schema: ExportSchema) -> DataFrame:
    """Apply per-field byte decoding (P5) to a pivoted binary frame.

    Drives :func:`hbase_tohdfs_spark.functions.codec.decode_as` from the
    export schema's field types, mirroring ``putValue``
    (``ExportHBaseTableToAvro.java:199-209``).  Unknown types raise
    :class:`~hbase_tohdfs_spark.model.UnknownDatatypeError` at plan time.
    """
    cols = [
        codec.decode_as(F.col(f.name), f.dataType).alias(f.name)
        for f in schema.struct.fields
    ]
    return wide.select("row_key", *cols)


def pivot_typed(
    cells: DataFrame,
    schema: ExportSchema,
    row_key_col: str | None = None,
    column_family: str | None = None,
    drop_empty: bool = True,
) -> DataFrame:
    """Pivot + typed decode in one call — the Avro/Parquet export path."""
    wide = pivot_cells(
        cells,
        schema.columns,
        row_key_col=row_key_col,
        column_family=column_family,
        drop_empty=drop_empty,
    )
    return decode_wide(wide, schema)


def render_delimited(
    wide: DataFrame,
    columns: list[str],
    delimiter: str,
    line_col: str = "line",
) -> DataFrame:
    """Wide binary rows -> one delimited text line per row (K1/K2 prep).

    NULL cells render as empty string between delimiters
    (``…Txt.java:176-182`` appends nothing), so ``coalesce`` before
    ``concat_ws`` — ``concat_ws`` alone would *drop* nulls and shift
    fields.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
    return wide.select(F.concat_ws(delimiter, *parts).alias(line_col))
