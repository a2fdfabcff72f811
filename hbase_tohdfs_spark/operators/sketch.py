"""Distinct-count sketching: a deterministic KMV (k-minimum-values)
estimator.

``approx_count_distinct`` (HyperLogLog++) is the built-in at-scale
answer, but its register layout is engine-internal — no independent SQL
engine can replay it, so it can't be oracle-checked.  KMV (Bar-Yossef et
al. '02; the bottom-k variant surveyed in Beyer et al., SIGMOD'07) gives
the same mergeable-sketch shape with a fully deterministic definition:

    hash every value to (0, 1]; keep the k smallest DISTINCT hashes per
    group; estimate = (k - 1) / h_k  where h_k is the k-th smallest.

Groups with fewer than k distinct values report the exact distinct count
(the standard small-range correction).  With md5-derived hashes both
Spark and DuckDB compute bit-identical estimates — the sketch is
auditable, reproducible across engines, and still O(k) state per group.

Scale shape: one keyed shuffle with map-side partial aggregation — the
per-(group, value) dedup — then a per-group window to rank hashes; the
window's input is at most |distinct values| rows, and only k survive.
A production deployment would keep the k-hash array as the mergeable
sketch (union = merge-and-truncate); the estimate column here is the
read-out of that sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hbase_tohdfs_spark.operators.text import token_hash_expr

#: 2^60, the hash domain: 15 md5 hex chars, the repo-wide 60-bit idiom
#: (token_hash_expr); uniform on [0, 2^60).
_HASH_DOMAIN = float(1 << 60)


def _hash01(col_sql: str):
    """md5-derived hash mapped to (0, 1]: (h + 1) / 2^60 so h_k is never
    zero.  Built on the shared ``token_hash_expr`` idiom; DuckDB replays
    it as (('0x' || substr(md5(x), 1, 15))::BIGINT + 1) / 2^60."""
    return (token_hash_expr(col_sql) + 1) / F.lit(_HASH_DOMAIN)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    round_to: int = 2,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Output: (group, n_exact_capped, n_kmv) — n_exact_capped is
    min(k, true distinct), i.e. the sketch's fill level; below k the
    estimate IS the exact count, at k the estimator takes over (error
    asserted within the theoretical ~1/sqrt(k-2) band in tests).
    """
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            _hash01(f"cast({value_col} as string)").alias("h"),
        )
        # distinct BEFORE ranking: KMV is defined on the distinct hash
        # set; duplicate rows must not occupy sketch slots.  This is the
        # keyed shuffle, partial-agg combined map-side.
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.max("h").alias("h_k"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_seen").alias("n_exact_capped"),
            F.round(
                F.when(
                    F.col("n_seen") < k, F.col("n_seen").cast("double")
                ).otherwise((k - 1) / F.col("h_k")),
                round_to,
            ).alias("n_kmv"),
        )
        .orderBy(group_col)
    )


def kmv_oracle_sql(
    table: str, group_col: str, value_col: str, k: int = 256, round_to: int = 2
) -> str:
    """The DuckDB replay of :func:`kmv_distinct` on ``table``."""
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {group_col} AS grp,
             (('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
                ::BIGINT + 1) / {_HASH_DOMAIN!r} AS h
      FROM {table}),
    ranked AS (
      SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS r
      FROM hashed)
    SELECT grp AS {group_col}, count(*) AS n_exact_capped,
           round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                      ELSE ({k} - 1) / max(h) END, {round_to}) AS n_kmv
    FROM ranked WHERE r <= {k}
    GROUP BY grp ORDER BY grp
    """
