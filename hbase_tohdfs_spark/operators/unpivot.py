"""Inverse of the pivot: wide rows -> narrow KV cells.

The reference only pivots narrow->wide; the inverse is what its generator
effectively does when writing 10 qualifiers per logical row
(``PopulateTable.java:130-134``).  We need it as a first-class operator to
ingest ordinary tables into the KV model (and to property-test the pivot:
``pivot(unpivot(df)) == df``).

Built on Spark's native ``unpivot`` (melt) — single narrow transform, no
shuffle; the per-row fan-out happens pipeline-side inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_tohdfs_spark.functions import codec


def unpivot_to_cells(
    df: DataFrame,
    row_key_expr,
    value_columns: list[str],
    cf: str = "c",
    ts_expr=None,
) -> DataFrame:
    """Turn ``value_columns`` of ``df`` into stringified KV cells.

    ``row_key_expr``: Column or column name producing the row key (cast to
    string).  ``ts_expr``: optional Column for the cell timestamp; defaults
    to 0 (callers that need last-write-wins tests supply their own).

    Values are encoded as UTF-8 bytes of their string rendering — the
    text-export-compatible encoding.  For fixed-width big-endian encoding
    use :func:`typed_cells`.
    """
    key = F.col(row_key_expr) if isinstance(row_key_expr, str) else row_key_expr
    ts = F.lit(0).cast("long") if ts_expr is None else ts_expr.cast("long")
    base = df.select(
        key.cast("string").alias("row_key"),
        ts.alias("ts"),
        *[F.col(c).cast("string").alias(c) for c in value_columns],
    )
    cells = base.unpivot(
        ids=["row_key", "ts"],
        values=value_columns,
        variableColumnName="qualifier",
        valueColumnName="_v",
    )
    return cells.select(
        "row_key",
        F.lit(cf).alias("cf"),
        "qualifier",
        F.col("_v").cast("binary").alias("value"),
        "ts",
    )


def typed_cells(
    df: DataFrame,
    row_key_expr,
    value_columns: list[str],
    cf: str = "c",
    ts_expr=None,
) -> DataFrame:
    """Like :func:`unpivot_to_cells` but values keep HBase fixed-width
    big-endian encoding per their Spark type (int -> 4 bytes, long -> 8,
    string -> UTF-8), exercising the ``Bytes.toInt/toLong`` decode path.
    """
    key = F.col(row_key_expr) if isinstance(row_key_expr, str) else row_key_expr
    ts = F.lit(0).cast("long") if ts_expr is None else ts_expr.cast("long")
    fields = {f.name: f.dataType for f in df.schema.fields}
    encoded = df.select(
        key.cast("string").alias("row_key"),
        ts.alias("ts"),
        *[codec.encode_as(F.col(c), fields[c]).alias(c) for c in value_columns],
    )
    cells = encoded.unpivot(
        ids=["row_key", "ts"],
        values=value_columns,
        variableColumnName="qualifier",
        valueColumnName="value",
    )
    return cells.select(
        "row_key", F.lit(cf).alias("cf"), "qualifier", "value", "ts"
    )
