"""Bounded range join — pairs (l, r) with ``r.ts`` inside a fixed window
around ``l.ts`` — without the quadratic blow-up of a naive non-equi join.

Spark turns a bare ``l.key = r.key AND r.ts BETWEEN ...`` into a
nested-loop per key (quadratic on hot keys).  The scale-safe shape is
*bucketization*: right rows land in time bucket ``rts // W`` (W = window
length); a left row's window spans at most two such buckets, so each
left row is exploded to its <= 2 candidate buckets, the join runs as a
plain equi-join on (key, bucket), and the exact range predicate filters
the small candidate set.  Shuffle volume: |R| + 2|L|, bounded candidates
per row, AQE-compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Inner-join pairs where ``left_ts + lower <= right_ts <= left_ts +
    upper`` and the ``on`` keys match.  ``lower``/``upper`` are in the
    ts unit (inclusive bounds); window length W = upper - lower must be
    positive.  Output: all left columns + all right columns (right ts
    column must not collide with a left name).
    """
    width = upper - lower
    if width <= 0:
        raise ValueError("upper must exceed lower")
    lo = F.col(left_ts) + F.lit(lower)
    hi = F.col(left_ts) + F.lit(upper)

    # Exact integer floor division for bucket ids (pmod keeps floor
    # semantics for negatives).  F.floor(x / width) would divide in
    # DOUBLE: above 2^53 ts magnitude the rounded quotient can cross an
    # integer boundary, silently assigning a row to the wrong bucket
    # and dropping matching pairs.
    def _bucket(sql: str) -> Column:
        return F.expr(f"(({sql}) - pmod({sql}, {width})) DIV {width}")

    l_exp = left.withColumn(
        "_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    _bucket(f"{left_ts} + {lower}"),
                    _bucket(f"{left_ts} + {upper}"),
                )
            )
        ),
    )
    r_b = right.withColumn("_bucket", _bucket(right_ts))
    joined = l_exp.join(r_b, [on, "_bucket"]).filter(
        (F.col(right_ts) >= lo) & (F.col(right_ts) <= hi)
    )
    return joined.drop("_bucket")
