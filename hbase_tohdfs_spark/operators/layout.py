"""Z-order (Morton curve) data layout for multi-dimensional scan pruning.

The problem at 100 TB: range-partitioning a table on ONE column gives
file-level min/max pruning for that column only — a predicate on any
other column still scans every file.  Interleaving the bits of two
columns into a single Morton key and range-partitioning on THAT clusters
the data along both dimensions at once, so parquet footer min/max
statistics prune files for predicates on either column (the technique
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; Morton '66, Orenstein &
Merrett '84).

Everything here is codegen-side bit arithmetic — no UDFs, no shuffle
beyond the one ``repartitionByRange`` that IS the layout operation — and
the key formula is plain shifts/masks, so the DuckDB oracle replays it
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits taken from each dimension; 2*ZBITS must stay under 63
ZBITS = 16


def zorder_sql(x_sql: str, y_sql: str, bits: int = ZBITS) -> str:
    """SQL expression interleaving the low ``bits`` of two non-negative
    bigint expressions: x's bit i lands at position 2i, y's at 2i+1.
    Unrolled into 2*bits shift terms — all inside whole-stage codegen.

    Valid in both Spark SQL and DuckDB (shiftleft/shiftright vs <</>>
    differ, so the caller picks via ``dialect``); this emits Spark form.
    """
    terms = []
    for i in range(bits):
        terms.append(
            f"shiftleft(shiftright(cast({x_sql} as bigint), {i}) & 1, {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright(cast({y_sql} as bigint), {i}) & 1, {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_sql_duckdb(x_sql: str, y_sql: str, bits: int = ZBITS) -> str:
    """The DuckDB replay of :func:`zorder_sql` (operator spelling only)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x_sql} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(
            f"(((CAST({y_sql} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col_sql: str,
    y_col_sql: str,
    n_files: int,
    bits: int = ZBITS,
    validate_domain: bool = False,
) -> None:
    """Lay ``df`` out as ``n_files`` parquet files range-partitioned on
    the Morton key of (x, y) — one shuffle, then footer min/max stats on
    BOTH columns become selective per file.  The z column itself is
    dropped before the write (it is layout state, not data).

    DOMAIN: only the low ``bits`` (default 16) of each dimension are
    interleaved, so values must lie in ``[0, 2**bits)`` — anything
    larger wraps mod ``2**bits`` and SILENTLY degrades clustering (the
    layout still writes, the oracle still matches, but far-apart values
    alias to the same cell).  Rebase unbounded dimensions to a
    dataset-relative origin first (e.g. ``hour - min(hour)``, as
    ``q_zorder_cells`` does).  Pass ``validate_domain=True`` to pay one
    extra aggregation scan that fails loudly on out-of-range input —
    off by default because at 100 TB the pre-scan doubles read I/O for
    a property the caller usually knows statically."""
    if not (0 < bits and 2 * bits < 63):
        raise ValueError(f"bits must satisfy 0 < 2*bits < 63, got {bits}")
    if validate_domain:
        lim = 1 << bits
        mx = df.selectExpr(
            f"max(cast({x_col_sql} as bigint)) AS mx",
            f"max(cast({y_col_sql} as bigint)) AS my",
            f"min(cast({x_col_sql} as bigint)) AS nx",
            f"min(cast({y_col_sql} as bigint)) AS ny",
        ).first()
        for dim, lo, hi in (("x", mx["nx"], mx["mx"]), ("y", mx["ny"], mx["my"])):
            if lo is None:  # all-NULL dimension: nothing to range-check
                continue
            if lo < 0 or hi >= lim:
                raise ValueError(
                    f"z-order {dim} dimension out of [0, {lim}) domain: "
                    f"spans [{lo}, {hi}] — rebase to a dataset-relative "
                    "origin or raise bits"
                )
    keyed = df.withColumn("_z", F.expr(zorder_sql(x_col_sql, y_col_sql, bits)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_report(df_reader, path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` for a parquet dataset — the pruning
    evidence: a selective predicate on ``col`` can skip every file whose
    span excludes it, and the read path is exactly the footer stats a
    real scan consults.  Returns [(file, min, max, span), ...]."""
    df = df_reader.parquet(path)
    rows = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        .collect()
    )
    return sorted(
        (r["f"].rsplit("/", 1)[-1], r["mn"], r["mx"], r["mx"] - r["mn"])
        for r in rows
    )
