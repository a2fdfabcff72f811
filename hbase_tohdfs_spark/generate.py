"""PopulateTable equivalent: deterministic synthetic KV cell generator.

Mirrors ``PopulateTable.java:91-139``: N parallel tasks, each emitting
``records_per_task`` logical rows of 10 cells with qualifiers ``C0..C9``
and values ``"counter:" + counter`` where ``counter`` is a per-task running
cell counter (``PopulateTable.java:130-134``).  The row key is
``lpad(keyRoot, 5, '0') + '|' + runID + '|' + taskId``
(``PopulateTable.java:124,131``) with keyRoot drawn in ``[0, 32768)``;
keyRoot collisions within a task are *intended* — they exercise cell
merging in the pivot, exactly as the reference's random generator does.

Differences from the reference, by design:
* Deterministic: keyRoot comes from a multiplicative-hash PRF of the global
  record id instead of ``Random`` — reproducible across runs AND
  expressible in ANSI SQL, so the DuckDB oracle can generate the identical
  dataset.
* Explicit ``ts``: a monotone global cell sequence replacing the HBase cell
  timestamp, making last-write-wins deterministic (SURVEY.md §2.8).

Scale: ``spark.range(n, numPartitions=tasks)`` is an O(1)-memory iterator
per task; the 10-cell fan-out is a generator (``explode``) inside
whole-stage codegen — no driver-side data, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Knuth multiplicative hash constant — public domain folklore.
_PRF_MULT = 2654435761
_KEY_SPACE = 32768  # Short.MAX_VALUE + 1, PopulateTable.java:124
_QUALIFIERS_PER_ROW = 10  # C0..C9, PopulateTable.java:130


def key_root_expr(global_id):
    """Deterministic stand-in for ``random.nextInt(Short.MAX_VALUE)``.

    ``(id * 2654435761) % 1000003 % 32768`` — the prime modulus scrambles
    the low bits so consecutive ids don't map to consecutive keyRoots.
    Pure integer arithmetic => identical in Spark and ANSI SQL (DuckDB).
    """
    return ((global_id * F.lit(_PRF_MULT)) % F.lit(1000003)) % F.lit(_KEY_SPACE)


def populate_cells(
    spark: SparkSession,
    num_tasks: int,
    records_per_task: int,
    run_id: str,
) -> DataFrame:
    """Generate the KV cell DataFrame (narrow model, CELL_SCHEMA).

    One output cell per (record, qualifier): ``num_tasks *
    records_per_task * 10`` cells total.  README-scale is 5 tasks x 1000
    records = 50,000 cells (``README.md:13``).
    """
    n = num_tasks * records_per_task
    base = spark.range(0, n, 1, numPartitions=num_tasks)
    gid = F.col("id")
    task_id = (gid / F.lit(records_per_task)).cast("long")
    key_root = key_root_expr(gid)
    row_key = F.concat_ws(
        "|",
        F.lpad(key_root.cast("string"), 5, "0"),
        F.lit(run_id),
        task_id.cast("string"),
    )
    # Per-task running cell counter (PopulateTable.java:132): the j-th cell
    # of the i-th record of a task has counter = i*10 + j.
    record_in_task = gid % F.lit(records_per_task)
    rows = base.select(
        row_key.alias("row_key"),
        gid.alias("_gid"),
        record_in_task.alias("_rit"),
    )
    q = F.explode(F.sequence(F.lit(0), F.lit(_QUALIFIERS_PER_ROW - 1))).alias("j")
    cells = rows.select("row_key", "_gid", "_rit", q)
    counter = F.col("_rit") * _QUALIFIERS_PER_ROW + F.col("j")
    ts = F.col("_gid") * _QUALIFIERS_PER_ROW + F.col("j")
    return cells.select(
        F.col("row_key"),
        F.lit("c").alias("cf"),
        F.concat(F.lit("C"), F.col("j").cast("string")).alias("qualifier"),
        F.concat(F.lit("counter:"), counter.cast("string"))
        .cast("binary")
        .alias("value"),
        ts.cast("long").alias("ts"),
    )


def populate_cells_oracle_sql(
    num_tasks: int, records_per_task: int, run_id: str
) -> str:
    """ANSI SQL (DuckDB) producing the identical cell set — the oracle
    for :func:`populate_cells`.  Values rendered as strings (DuckDB blob
    hashing differs; the driver compares stringified cells)."""
    n = num_tasks * records_per_task
    return f"""
        SELECT
          lpad(CAST((gid * {_PRF_MULT}) % 1000003 % {_KEY_SPACE} AS VARCHAR), 5, '0')
            || '|{run_id}|' || CAST(gid // {records_per_task} AS VARCHAR) AS row_key,
          'c' AS cf,
          'C' || CAST(j AS VARCHAR) AS qualifier,
          'counter:' || CAST((gid % {records_per_task}) * 10 + j AS VARCHAR) AS value_str,
          gid * 10 + j AS ts
        FROM range(0, {n}) t(gid)
        CROSS JOIN range(0, 10) u(j)
    """
