"""As-of (point-in-time) join — a custom operator Spark has no built-in
for, composed from stock DataFrame ops.

``asof_join(left, right, ...)`` attaches, to every left row, the right
row with the greatest ``right_ts <= left_ts`` within the same key —
the standard point-in-time lookup (market data, feature stores,
"state as of the event").

Implementation is the union + running-``last`` trick, NOT a range join:
tag both sides, union, and take ``last(value, ignorenulls=True)`` over a
window ordered by ``(ts, side)`` with right rows sorting before left
rows at equal timestamps (that's what makes the match inclusive).

Scale: one shuffle keyed on the join key and a sort within partitions —
O(n log n) per partition, O(1) carry state per row, and no candidate
blow-up (a naive ``l.ts >= r.ts`` range join is quadratic per key).  A
pathologically hot key serializes its own sort; salt by time-bucket if
one key exceeds a task (the carried state is a single row, so bucket
boundaries just need one overlap row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the latest right ``value_cols`` as of each left ``ts``.

    ``on``: equi-join key column (same name both sides).
    ``ts``: ordering column (same name both sides).
    ``value_cols``: right columns to carry (default: all non-key/ts).
    ``tiebreak``: optional right column ordering duplicates of the same
    (key, ts) — the greatest wins, keeping the result deterministic.

    Right rows with a ts equal to a left row's ts DO match (inclusive).
    Left rows with no prior right row get NULLs (left-join semantics).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, ts)]

    if tiebreak is not None:
        w_dedup = Window.partitionBy(on, ts).orderBy(F.col(tiebreak).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = right.select(
        on, ts, *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in value_cols]
    )
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    return out
