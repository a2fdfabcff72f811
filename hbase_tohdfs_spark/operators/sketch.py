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


#: hex digits of one md5 digest per derived hash (32 bits each).  The
#: multi-hash sketches (CMS rows, Bloom probes) derive their i-th hash
#: as disjoint bit-slices of ONE digest instead of hashing ``i:value``
#: once per hash — the classic derive-k-from-one-digest construction
#: (Kirsch & Mitzenmacher '06 prove two derived hashes suffice for
#: Bloom-type bounds; disjoint slices of a strong digest are the
#: stronger variant).  Motivation is measured, not stylistic: the 4M-row
#: streaming probe showed the per-cell md5 — not the bounded state — is
#: the CMS twin's scaling term (SCALE.md), and one digest cuts that
#: term ``rows``-fold.  Past ``_MAX_SLICED`` hashes the 32 hex digits
#: are exhausted and the per-hash ``i:value`` md5 is used instead.
_SLICE_HEX = 8
_MAX_SLICED = 32 // _SLICE_HEX


def _hex_slice_expr(digest_sql: str, idx_sql: str):
    """32-bit unsigned int from hex slice ``idx`` of an md5 digest
    column; hashlib twin: ``int(md5(v).hexdigest()[8*i:8*i+8], 16)``,
    DuckDB twin: ``('0x' || substr(md5(v), 1 + 8*i, 8))::BIGINT``."""
    return F.expr(
        f"cast(conv(substr({digest_sql}, ({idx_sql}) * {_SLICE_HEX} + 1, "
        f"{_SLICE_HEX}), 16, 10) as bigint)"
    )


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


def cms_cells(
    df: DataFrame,
    value_col: str,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """``(r, bucket)`` — one cell per input row per hash row; the shared
    fan-out of the batch sketch build and the streaming update-mode
    state (``streaming/pivot_stream.cms_counts_stream``).

    ONE md5 per VALUE, not per cell: for ``rows`` <= 4 the digest is
    computed BEFORE the row fan-out and hash row ``r`` reads its own
    disjoint 32-bit slice (see ``_SLICE_HEX``) — the explode then
    copies a 32-char string instead of re-hashing, so the per-event
    cost at stream/scan time is one digest however many rows the
    sketch keeps.  ``rows`` > 4 exhausts the digest and falls back to
    one ``r:value`` md5 per cell."""
    r = F.explode(F.sequence(F.lit(0), F.lit(rows - 1))).alias("r")
    v = F.col(value_col).cast("string")
    if rows <= _MAX_SLICED:
        return (
            df.select(F.md5(v).alias("d"))
            .select("d", r)
            .select("r", (_hex_slice_expr("d", "r") % width).alias("bucket"))
        )
    return (
        df.select(v.alias("v"), r)
        .select(
            "r",
            (token_hash_expr("concat(r, ':', v)") % width).alias("bucket"),
        )
    )


def cms_counts(
    df: DataFrame,
    value_col: str,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan '05) over a
    column: ``rows`` hash rows of ``width`` counters.

    Like the KMV sketch, the point of the md5-derived hashes is that the
    sketch is DETERMINISTIC and replayable in ANSI SQL — the same
    mergeable O(rows*width) state HLL-era systems keep, but auditable
    across engines.  One digest + generator fan-out per input row (no
    shuffle; see :func:`cms_cells`) + one keyed aggregation whose
    reduce side is at most rows*width counters regardless of corpus
    size.
    """
    return (
        cms_cells(df, value_col, rows, width)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    df: DataFrame,
    value_col: str,
    probe_values: list,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
    sketch: DataFrame | None = None,
    merge_emissions: bool = False,
) -> DataFrame:
    """Point-query the sketch for ``probe_values``: estimate = min over
    hash rows of the probed counter — always >= the true count, with
    overestimate bounded by ~2N/width at 1 - (1/2)^rows confidence.

    The true count rides along so the estimate's error is directly
    inspectable (and bounded in tests).

    Probe-side plan shape, SMALL probe lists (the point-query case):
    the probed cells are known at plan time (md5 is md5 — the driver
    computes the identical digest-slice bucket with hashlib, see
    :func:`cms_cells`), so the point query needs NO joins at all.  The estimate
    is ONE global conditional aggregation over the <= rows*width
    sketch cells, the true counts are ONE conditional aggregation
    folded into the events scan, and the two 1-row frames meet in a
    trivial 1x1 crossJoin + struct-explode unpivot.  That replaces
    three joins (probe x sketch, semi-join truth, est x truth) and
    their exchanges with two scans — measured 1.07s -> ~0.6s per
    fresh execution on the batch twin at sf0.1, and the same shape at
    100 TB: the events pass is map-side partial aggregation into a
    single row, the sketch pass is model-sized.

    Past ``_CMS_PROBE_FANOUT_MAX`` distinct probes the conditional-agg
    width (probes x rows exprs, each evaluated per event row) loses to
    joins, so the query falls back to the broadcast-join formulation —
    O(1) work per event row regardless of probe count.

    Probe values are deduplicated (first occurrence wins, matching the
    oracle's GROUP BY), and an empty probe list returns an empty frame.

    ``sketch`` overrides the sketch frame (columns r, bucket, c) — the
    streaming twin passes its stateful-agg result here so probe logic
    and output shape are literally shared with the batch path.

    ``merge_emissions=True`` declares that ``sketch`` may carry SEVERAL
    rows per (r, bucket) cell whose counts are monotone non-decreasing
    (an UPDATE-mode streaming sink re-emits a cell on every micro-batch
    that touches it).  The per-cell read then takes ``max`` over the
    emissions instead of requiring the caller to pre-merge with a
    ``groupBy(r, bucket).max`` — which folds the merge into the same
    single global aggregation and deletes a whole exchange from the
    streaming twin's probe (measured sf0.1: est pass 0.57s -> 0.2s;
    the saved exchange shuffled ~1k rows across 32 partitions, pure
    scheduling waste at any scale because the sketch is model-sized).
    """
    import hashlib

    spark = df.sparkSession
    if sketch is None:
        sketch = cms_counts(df, value_col, rows, width)
    probes = list(dict.fromkeys(str(v) for v in probe_values))
    if not probes:
        return spark.createDataFrame(
            [], f"{value_col} string, true_count long, cms_count long"
        )
    if len(probes) > _CMS_PROBE_FANOUT_MAX:
        if merge_emissions:
            # the joined path broadcasts the sketch, so it must be
            # cell-unique; the merge is a model-sized aggregation
            sketch = sketch.groupBy("r", "bucket").agg(
                F.max("c").alias("c")
            )
        return _cms_estimate_joined(df, value_col, probes, rows, width, sketch)

    def probe_bucket(row_i: int, v: str) -> int:
        # hashlib twin of cms_cells' hash, branch for branch
        if rows <= _MAX_SLICED:
            digest = hashlib.md5(v.encode()).hexdigest()
            h = int(digest[row_i * _SLICE_HEX : (row_i + 1) * _SLICE_HEX], 16)
        else:
            h = int(hashlib.md5(f"{row_i}:{v}".encode()).hexdigest()[:15], 16)
        return h % width

    # One aggregate per probed cell.  Each (i, row_i) predicate selects
    # EXACTLY ONE (r, bucket) cell, so with a cell-unique sketch min and
    # max read the same value; with merge_emissions the max collapses
    # duplicate monotone emissions to the final count inside this same
    # pass.  Absent cell = count 0 (coalesce per cell BEFORE the
    # cross-row min, exactly like the joined formulation's
    # min(coalesce(c, 0))).
    cell_read = F.max if merge_emissions else F.min
    cell_mins = [
        cell_read(
            F.when(
                (F.col("r") == row_i)
                & (F.col("bucket") == probe_bucket(row_i, v)),
                F.col("c"),
            )
        ).alias(f"m_{i}_{row_i}")
        for i, v in enumerate(probes)
        for row_i in range(rows)
    ]

    def min_over_rows(i: int):
        cells = [
            F.coalesce(F.col(f"m_{i}_{row_i}"), F.lit(0).cast("long"))
            for row_i in range(rows)
        ]
        return cells[0] if rows == 1 else F.least(*cells)

    est_row = sketch.agg(*cell_mins).select(
        *[min_over_rows(i).alias(f"cms_{i}") for i in range(len(probes))]
    )
    truth_row = df.agg(
        *[
            F.count(
                F.when(F.col(value_col).cast("string") == v, F.lit(1))
            ).alias(f"t_{i}")
            for i, v in enumerate(probes)
        ]
    )
    # Unpivot via literal structs + explode: F.lit(v) carries the probe
    # string as a VALUE, immune to the quoting/escaping pitfalls of
    # rendering it into a parsed SQL snippet (a probe containing a
    # backslash broke the earlier stack() rendering).
    triples = F.array(
        *[
            F.struct(
                F.lit(v).alias("v"),
                F.col(f"t_{i}").alias("true_count"),
                F.col(f"cms_{i}").alias("cms_count"),
            )
            for i, v in enumerate(probes)
        ]
    )
    # coalesce(1) + sortWithinPartitions gives the identical total order
    # as orderBy WITHOUT the range-partitioner's sampling job — the
    # output is bounded by the probe list (<= _CMS_PROBE_FANOUT_MAX rows
    # on this path), so one partition is right-sized at any corpus
    # scale.  Measured ~0.3-0.4s/fresh execution at sf0.1 (SCALE.md
    # "Round-7 continuation III", landed r8).
    return (
        est_row.crossJoin(truth_row)
        .select(F.explode(triples).alias("p"))
        .select(
            F.col("p.v").alias(value_col),
            F.col("p.true_count").alias("true_count"),
            F.col("p.cms_count").alias("cms_count"),
        )
        .coalesce(1)
        .sortWithinPartitions(value_col)
    )


#: above this many distinct probes, cms_estimate switches from the
#: plan-time conditional-agg shape (probes*rows exprs per event row) to
#: the broadcast-join shape (constant per-row work).
_CMS_PROBE_FANOUT_MAX = 32


def _cms_estimate_joined(
    df: DataFrame,
    value_col: str,
    probes: list,
    rows: int,
    width: int,
    sketch: DataFrame,
) -> DataFrame:
    """Broadcast-join formulation of the CMS point query, for LARGE
    probe lists: probe buckets computed engine-side, joined against the
    broadcast model-sized sketch, true counts via a broadcast semi-join
    — every step O(1) per event row in the number of probes."""
    spark = df.sparkSession
    probes_df = spark.createDataFrame([(v,) for v in probes], "v string")
    r = F.explode(F.sequence(F.lit(0), F.lit(rows - 1))).alias("r")
    if rows <= _MAX_SLICED:
        probe_buckets = (
            probes_df.select("v", F.md5("v").alias("d"))
            .select("v", "d", r)
            .select(
                "v", "r", (_hex_slice_expr("d", "r") % width).alias("bucket")
            )
        )
    else:
        probe_buckets = probes_df.select("v", r).select(
            "v",
            "r",
            (token_hash_expr("concat(r, ':', v)") % width).alias("bucket"),
        )
    est = (
        probe_buckets.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_count"))
    )
    truth = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .join(F.broadcast(probes_df), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    # Same sampling-job elision as the conditional-agg path: the output
    # is exactly len(probes) rows — a driver-side Python list, model-
    # sized by construction — so a single sorted partition beats a
    # range-partitioned global sort at any corpus scale.
    return (
        est.join(F.broadcast(truth), "v", "left")
        .select(
            F.col("v").alias(value_col),
            F.coalesce("true_count", F.lit(0).cast("long")).alias(
                "true_count"
            ),
            "cms_count",
        )
        .coalesce(1)
        .sortWithinPartitions(value_col)
    )


def cms_oracle_sql(
    table: str,
    value_col: str,
    probe_values: list,
    rows: int = CMS_ROWS,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB replay of :func:`cms_estimate` on ``table`` — including
    :func:`cms_cells`' hash derivation, branch for branch (one digest
    sliced per hash row when rows <= 4, per-row ``r:value`` md5
    otherwise)."""
    probes = ", ".join(f"('{v}')" for v in probe_values)

    def bucket_sql(val: str) -> str:
        if rows <= _MAX_SLICED:
            return (
                f"('0x' || substr(md5({val}), 1 + {_SLICE_HEX} * r.r, "
                f"{_SLICE_HEX}))::BIGINT % {width}"
            )
        return (
            f"('0x' || substr(md5(r.r || ':' || {val}), 1, 15))::BIGINT"
            f" % {width}"
        )

    return f"""
    WITH vals AS (SELECT CAST({value_col} AS VARCHAR) AS v FROM {table}),
    hashed AS (SELECT v, r.r, {bucket_sql('v')} AS bucket
               FROM vals CROSS JOIN generate_series(0, {rows - 1}) AS r(r)),
    sketch AS (SELECT r, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
    probes AS (SELECT * FROM (VALUES {probes}) AS p(v)),
    pb AS (SELECT p.v, r.r, {bucket_sql('p.v')} AS bucket
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


# ------------------------------------------------------- hyperloglog
#: canonical small-m alpha constants (Flajolet et al. '07, Fig. 3)
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_params(b: int) -> tuple[int, int, float]:
    if not 4 <= b <= 6:
        # the exact-integer register sum below needs m * 2^maxrho to fit
        # a BIGINT: b=6 peaks at 2^61.  Larger m would switch to doubles
        # and lose cross-engine bit-identity.
        raise ValueError("b must be in [4, 6]")
    m = 1 << b
    maxrho = 60 - b + 1  # cap when the suffix is all zeros
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    return m, maxrho, alpha


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 5,
    round_to: int = 2,
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic HyperLogLog
    (Flajolet et al. '07) — the register sketch itself, not the built-in
    ``approx_count_distinct`` whose HLL++ layout no independent engine
    can replay.

    Layout: the 60-bit md5 hash splits into a register index (``h % m``,
    m = 2^b registers) and a suffix ``w = h div m``; the register keeps
    the max over values of rho(w) = trailing zeros + 1 (w = 0 caps at
    61 - b).  Estimate = alpha_m * m^2 / sum(2^-reg) with the standard
    linear-counting small-range correction when the raw estimate is
    under 2.5m and empty registers remain.

    Cross-engine determinism is engineered, not assumed: the harmonic
    sum is computed as EXACT integers (each register contributes
    ``2^(maxrho - reg)``, empty registers ``2^maxrho``) so no
    floating-point addition order exists; the single division and the
    bigint->double cast are IEEE-exact in both engines, and the
    linear-counting branch's ``ln`` sits >= 1e-6 away from every
    round(2) boundary for all m-1 possible arguments, so libm 1-ulp
    differences cannot flip a digit.

    Scale shape: one keyed shuffle whose reduce side is at most m rows
    per group (map-side partial max), then a per-group m-row fold —
    O(m) mergeable state per group, the classic production sketch.

    Output: (group, registers_hit, n_hll).
    """
    regs = (
        hll_cells(df, group_col, value_col, b)
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    return hll_estimate_from_registers(regs, group_col, b, round_to)


def hll_cells(
    df: DataFrame, group_col: str, value_col: str, b: int = 5
) -> DataFrame:
    """Map-side HLL cell derivation: (grp, bucket, rho) per row — the
    shared front half of the batch and streaming paths (the streaming
    twin feeds these cells into an update-mode ``max`` aggregation whose
    state IS the register array)."""
    m, maxrho, _alpha = _hll_params(b)
    hs = (
        f"cast(conv(substr(md5(cast({value_col} as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    rho = (
        f"CASE WHEN w = 0 THEN {maxrho} ELSE "
        f"length(bin(w)) - length(trim(TRAILING '0' FROM bin(w))) + 1 END"
    )
    return df.selectExpr(
        f"{group_col} as grp",
        f"pmod({hs}, {m}) as bucket",
        f"({hs}) div {m} as w",
    ).selectExpr("grp", "bucket", f"{rho} as rho")


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str, b: int = 5, round_to: int = 2
) -> DataFrame:
    """Read out (grp, bucket, reg) registers into the per-group estimate
    — exact-integer harmonic sum, see :func:`hll_distinct`."""
    m, maxrho, alpha = _hll_params(b)
    # alpha * m^2 * 2^maxrho: double * powers of two — exact scaling,
    # computed once here and embedded as the same literal both engines see
    num = alpha * m * m * (1 << maxrho)
    est = (
        regs.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(
                F.expr(f"shiftleft(cast(1 as bigint), {maxrho} - reg)")
            ).alias("s_hit"),
        )
        .selectExpr(
            "grp",
            f"cast({m} - nb as int) as zeros",
            f"{num!r} / (s_hit + ({m} - nb) * shiftleft(cast(1 as bigint),"
            f" {maxrho})) as e_raw",
        )
        .selectExpr(
            "grp",
            f"cast({m} - zeros as int) as registers_hit",
            f"round(CASE WHEN e_raw <= {2.5 * m!r} AND zeros > 0 THEN"
            f" {m} * ln({m} / cast(zeros as double))"
            f" ELSE e_raw END, {round_to}) as n_hll",
        )
    )
    return est.select(
        F.col("grp").alias(group_col), "registers_hit", "n_hll"
    ).orderBy(group_col)


def hll_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    b: int = 5,
    round_to: int = 2,
) -> str:
    """The DuckDB replay of :func:`hll_distinct` on ``table``."""
    m, maxrho, alpha = _hll_params(b)
    num = alpha * m * m * (1 << maxrho)
    return f"""
    WITH hashed AS (
      SELECT {group_col} AS grp,
             ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
               ::BIGINT AS h
      FROM {table}),
    hb AS (SELECT grp, h % {m} AS bucket, h // {m} AS w FROM hashed),
    rr AS (SELECT grp, bucket,
                  CASE WHEN w = 0 THEN {maxrho}
                       ELSE length(bin(w)) - length(rtrim(bin(w), '0')) + 1
                  END AS rho
           FROM hb),
    regs AS (SELECT grp, bucket, max(rho) AS reg FROM rr GROUP BY 1, 2),
    est AS (SELECT grp,
                   CAST({m} - count(*) AS INT) AS zeros,
                   {num!r} / (sum((1::BIGINT << ({maxrho} - reg)))
                     + ({m} - count(*)) * (1::BIGINT << {maxrho})) AS e_raw
            FROM regs GROUP BY 1)
    SELECT grp AS {group_col},
           CAST({m} - zeros AS INT) AS registers_hit,
           round(CASE WHEN e_raw <= {2.5 * m!r} AND zeros > 0
                      THEN {m} * ln({m} / CAST(zeros AS DOUBLE))
                      ELSE e_raw END, {round_to}) AS n_hll
    FROM est ORDER BY {group_col}
    """


# ------------------------------------------------------- bloom filter
BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _check_bloom_bits(m_bits: int) -> None:
    """Reject bit counts the word-packed mask cannot represent.  A
    position in the truncated ``m_bits % 64`` remainder would index past
    the literal array, ``element_at`` would go null, and a REAL member
    would be filtered out — a silent false negative."""
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of 64, got {m_bits}: "
            "the mask is packed into 64-bit words and a remainder would "
            "drop positions, producing bloom false negatives"
        )


def bloom_mask(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
) -> list[int]:
    """Build a Bloom filter over a (small) key set and return it as
    m_bits/64 signed-64-bit words — model-sized state (4096 bits = 64
    longs) that ships into probe-side plans as a literal, exactly like
    Spark's own InjectRuntimeFilter bloom but deterministic (md5-derived
    positions) and therefore SQL-replayable.

    The build is one distributed projection (key -> k positions, a
    generator fan-out) whose DISTINCT positions collect to the driver —
    at most m_bits values regardless of build-side row count.

    ``m_bits`` must be a positive multiple of 64: the mask is stored as
    64-bit words, so a ragged bit count would silently truncate the top
    positions and turn the no-false-negatives contract into false
    negatives at probe time.  Fail loudly instead.
    """
    _check_bloom_bits(m_bits)
    j = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j")
    v = F.col(key_col).cast("string")
    if k_hashes <= _MAX_SLICED:
        # one digest per key; position j reads its own 32-bit slice
        # (same derivation as cms_cells — see _SLICE_HEX)
        pos = (
            df.select(F.md5(v).alias("d"))
            .select("d", j)
            .select((_hex_slice_expr("d", "j") % m_bits).alias("pos"))
        )
    else:
        pos = df.select(v.alias("v"), j).select(
            (token_hash_expr("concat(j, ':', v)") % m_bits).alias("pos")
        )
    pos_rows = pos.distinct().collect()
    words = [0] * (m_bits // 64)
    for row in pos_rows:
        p = row["pos"]
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into Java long range
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_contains(
    key_sql: str,
    words: list[int],
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
):
    """Membership-test Column: all k hash positions set in the mask.
    Pure codegen — an O(1) array index + shift per probe, no join, no
    shuffle; `(x >> n) & 1` is bit-exact under arithmetic shift.
    For k <= 4 the k positions are slices of ONE md5 digest; the k
    probe predicates share the ``md5(key)`` subexpression, which
    whole-stage codegen's subexpression elimination evaluates once —
    so the map-side pre-filter costs one digest per probed row, not k
    (the old ``j:key`` inputs were all distinct and defeated CSE).
    ``m_bits`` must match the mask: a positive multiple of 64 equal to
    ``64 * len(words)``, or probes could index past the array."""
    _check_bloom_bits(m_bits)
    if m_bits != 64 * len(words):
        raise ValueError(
            f"mask length mismatch: m_bits={m_bits} but words holds "
            f"{64 * len(words)} bits — probe positions would go out of "
            "bounds (null membership -> false negatives)"
        )
    arr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    probes = []
    for h in bloom_pos_sqls(key_sql, m_bits, k_hashes):
        probes.append(
            f"((shiftright(element_at({arr}, cast(({h}) div 64 as int) + 1),"
            f" cast(({h}) % 64 as int)) & 1) = 1)"
        )
    return F.expr(" AND ".join(probes))


def bloom_pos_sqls(
    key_sql: str, m_bits: int = BLOOM_BITS, k_hashes: int = BLOOM_HASHES
) -> list[str]:
    """The k Bloom position expressions for one key, Spark-SQL spelling
    — the single source of the probe-side hash derivation.  k <= 4:
    disjoint digest slices of one md5; beyond that the digest is
    exhausted and each position hashes ``j:key`` (same branch rule as
    ``cms_cells``).  ``bloom_oracle_pos_sql`` is the DuckDB spelling;
    keep the two branch-for-branch."""
    key = f"cast({key_sql} as string)"
    if k_hashes <= _MAX_SLICED:
        return [
            f"(cast(conv(substr(md5({key}), {j * _SLICE_HEX + 1}, "
            f"{_SLICE_HEX}), 16, 10) as bigint) % {m_bits})"
            for j in range(k_hashes)
        ]
    return [
        f"(cast(conv(substr(md5(concat('{j}', ':', {key})), 1, 15), 16, 10)"
        f" as bigint) % {m_bits})"
        for j in range(k_hashes)
    ]


def bloom_oracle_pos_sql(
    val_sql: str, m_bits: int = BLOOM_BITS, k_hashes: int = BLOOM_HASHES
) -> str:
    """DuckDB replay of the Bloom position derivation, branch for
    branch with :func:`bloom_pos_sqls` (the round-7 review found the
    oracle hardcoding the sliced branch — at k > 4 it would read past
    the 32 hex digits and crash instead of replaying the engine's
    fallback).  ``j.j`` is the hash-index column the caller supplies
    via ``generate_series(0, k-1) AS j(j)``; ``val_sql`` must already
    be VARCHAR."""
    if k_hashes <= _MAX_SLICED:
        return (
            f"('0x' || substr(md5({val_sql}), 1 + {_SLICE_HEX} * j.j, "
            f"{_SLICE_HEX}))::BIGINT % {m_bits}"
        )
    return (
        f"('0x' || substr(md5(j.j || ':' || {val_sql}), 1, 15))::BIGINT"
        f" % {m_bits}"
    )


def bloom_semijoin_stats(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Pre-filter ``probe`` with a Bloom filter built from ``build``'s
    keys and report what the filter did: rows probed, rows passing the
    bloom, true semi-join matches, false positives, fp rate.

    The 100 TB story: a selective join's shuffle cost is dominated by
    probe rows that will never match; a build-side bloom shipped as a
    literal prunes them MAP-SIDE, before any exchange, at 64 longs of
    plan state.  No false negatives by construction (``true_matches ==
    bloom passes that really match`` is asserted in tests, and the
    oracle replays the exact mask).
    """
    words = bloom_mask(build, build_key, m_bits, k_hashes)
    hit = bloom_contains(probe_key, words, m_bits, k_hashes)
    truth = build.select(F.col(build_key).cast("string").alias("bk")).distinct()
    flagged = probe.select(
        hit.alias("in_bloom"),
        F.col(probe_key).cast("string").alias("pk"),
    ).join(F.broadcast(truth), F.col("pk") == F.col("bk"), "left")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("in_bloom"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("bk").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_match"),
        F.sum(
            F.when(F.col("in_bloom") & F.col("bk").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_pos"),
    ).select(
        "n_probed",
        "n_bloom_pass",
        "n_true_match",
        "n_false_pos",
        # every probe row matching -> no non-member population to
        # measure a false-positive rate on: report null, not a /0
        F.when(
            F.col("n_probed") > F.col("n_true_match"),
            F.round(
                F.col("n_false_pos")
                / (F.col("n_probed") - F.col("n_true_match")),
                6,
            ),
        ).alias("fp_rate"),
    )
