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


# ------------------------------------------------------- count-min sketch
CMS_ROWS = 4
CMS_WIDTH = 256


def cms_counts(
    df: DataFrame,
    value_col: str,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan '05) over a
    column: ``rows`` independent hash rows of ``width`` counters.

    Like the KMV sketch, the point of the md5-derived hashes is that the
    sketch is DETERMINISTIC and replayable in ANSI SQL — the same
    mergeable O(rows*width) state HLL-era systems keep, but auditable
    across engines.  One generator fan-out (explode of the row index, no
    shuffle) + one keyed aggregation whose reduce side is at most
    rows*width counters regardless of corpus size.
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(rows - 1))).alias("r")
    bucket = token_hash_expr("concat(r, ':', v)") % width
    return (
        df.select(F.col(value_col).cast("string").alias("v"), r)
        .select("r", bucket.alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    df: DataFrame,
    value_col: str,
    probe_values: list,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for ``probe_values``: estimate = min over
    hash rows of the probed counter — always >= the true count, with
    overestimate bounded by ~2N/width at 1 - (1/2)^rows confidence.

    The true count rides along so the estimate's error is directly
    inspectable (and bounded in tests).  The probe side is a literal
    |probes| x rows frame broadcast against the (rows*width)-row sketch.
    """
    sketch = cms_counts(df, value_col, rows, width)
    probes = df.sparkSession.createDataFrame(
        [(str(v),) for v in probe_values], "v string"
    )
    r = F.explode(F.sequence(F.lit(0), F.lit(rows - 1))).alias("r")
    probe_buckets = probes.select("v", r).select(
        "v", "r", (token_hash_expr("concat(r, ':', v)") % width).alias("bucket")
    )
    est = (
        probe_buckets.join(sketch, ["r", "bucket"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_count"))
    )
    truth = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .join(F.broadcast(probes), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        est.join(truth, "v", "left")
        .select(
            F.col("v").alias(value_col),
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            "cms_count",
        )
        .orderBy(value_col)
    )


def cms_oracle_sql(
    table: str,
    value_col: str,
    probe_values: list,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB replay of :func:`cms_estimate` on ``table``."""
    probes = ", ".join(f"('{v}')" for v in probe_values)
    return f"""
    WITH vals AS (SELECT CAST({value_col} AS VARCHAR) AS v FROM {table}),
    hashed AS (SELECT v, r.r,
                      ('0x' || substr(md5(r.r || ':' || v), 1, 15))::BIGINT
                        % {width} AS bucket
               FROM vals CROSS JOIN generate_series(0, {rows - 1}) AS r(r)),
    sketch AS (SELECT r, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
    probes AS (SELECT * FROM (VALUES {probes}) AS p(v)),
    pb AS (SELECT p.v, r.r,
                  ('0x' || substr(md5(r.r || ':' || p.v), 1, 15))::BIGINT
                    % {width} AS bucket
           FROM probes p CROSS JOIN generate_series(0, {rows - 1}) AS r(r)),
    est AS (SELECT pb.v, min(coalesce(s.c, 0)) AS cms_count
            FROM pb LEFT JOIN sketch s USING (r, bucket) GROUP BY 1),
    truth AS (SELECT v, count(*) AS true_count FROM vals
              WHERE v IN (SELECT v FROM probes) GROUP BY 1)
    SELECT e.v AS {value_col}, coalesce(t.true_count, 0) AS true_count,
           e.cms_count
    FROM est e LEFT JOIN truth t USING (v)
    ORDER BY {value_col}
    """
