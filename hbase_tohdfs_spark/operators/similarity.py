"""Similarity search over an embedding column (array<float>).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, JVM-side dot products via ``zip_with`` +
  ``aggregate``, per-query top-k with a window.  The correctness
  baseline, and already the right physical plan for "few queries vs huge
  corpus" (one broadcast, one shuffle keyed by query for the top-k).

* ``lsh_topk`` — the scale path: random-hyperplane LSH (Charikar '02).
  Sign-bit buckets from ``NUM_PLANES`` fixed hyperplanes; queries only
  score candidates in their bucket.  The hyperplanes are deterministic
  (md5-derived ±1 entries, precomputed driver-side, shipped as a literal
  array) so results are reproducible and the DuckDB oracle can replay
  them.  Multi-probe (Hamming-1 neighbor buckets) is the default — the
  probe set is deterministic too, so the oracle replays it exactly.

No Python UDFs anywhere — the inner products run inside codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_tohdfs_spark.operators import cacheutil

NUM_PLANES = 8


def hyperplane_signs(num_planes: int = NUM_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix: sign(p, d) = +1 iff the low bit
    of md5(f"{p}_{d}") is 1.  Same values are reproducible in ANSI SQL."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
            row.append(1 if int(h[:15], 16) & 1 else -1)
        planes.append(row)
    return planes


def _double_sql(x: float) -> str:
    """Exact SQL double literal for ``x``: ``repr`` round-trips the IEEE
    value (including denormals) and Spark's parser reads the ``D``
    suffix back to the identical bits — verified down to 5e-324."""
    if x != x:
        return "double('NaN')"
    if x == float("inf"):
        return "double('Infinity')"
    if x == float("-inf"):
        return "double('-Infinity')"
    return f"{x!r}D"


def centroid_literal(cents: list[list[float]]) -> F.Column:
    """k x d centroid matrix as ONE SQL-parsed array literal.

    ``F.lit(nested_list)`` builds the same tree element by element over
    py4j — ~0.45s of driver round trips for an 8x64 matrix, paid on
    EVERY Lloyd iteration because each iteration plans against new
    centroid values.  Rendering the matrix as a single SQL string and
    letting the JVM parse it costs ~2ms for the identical literal tree
    (bit-exact: see ``_double_sql``).  Iterative operators (k-means,
    SemDeDup) call this once per iteration; the plan itself is
    unchanged, only its construction cost."""
    rows = ",".join(
        "array(" + ",".join(_double_sql(float(v)) for v in c) + ")"
        for c in cents
    )
    return F.expr(f"array({rows})")


def _norm_expr(col: str):
    return F.expr(
        f"sqrt(aggregate(zip_with({col}, {col}, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, x) -> acc + x))"
    )


def _dot_expr(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, x) -> acc + x)"
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excluding itself).

    Output: (query_id, vec_id, cosine), k rows per query, deterministic
    order (cosine desc, vec_id asc) with rounded scores so ranking ties
    resolve identically everywhere.
    """
    from pyspark.sql import Window

    e = embeddings.select("vec_id", "embedding", _norm_expr("embedding").alias("norm"))
    q = (
        e.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot_expr("embedding", "qv") / (F.col("norm") * F.col("qnorm")), round_to)
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def bucket_expr(vec_col: str, planes: list[list[int]]):
    """LSH bucket id: bit p set iff dot(vec, plane_p) > 0.

    The product is null-safe (``coalesce(x*y, 0)``): when the vector's
    dimensionality differs from the planes', ``zip_with`` null-pads the
    shorter side, and without the coalesce a single null would poison
    the whole aggregate — every vector would land in bucket 0 and the
    "approximate" search would silently degrade to a full scan.  With
    it, mismatched dims degrade gracefully to bucketing on the
    overlapping prefix (and matching dims are bit-identical)."""
    terms = []
    for p, row in enumerate(planes):
        arr = ", ".join(f"{v}D" for v in row)
        terms.append(
            f"(CASE WHEN aggregate(zip_with({vec_col}, array({arr}),"
            f" (x, y) -> coalesce(cast(x as double) * y, 0D)),"
            f" 0D, (acc, x) -> acc + x) > 0"
            f" THEN shiftleft(1, {p}) ELSE 0 END)"
        )
    return F.expr(" + ".join(terms))


NUM_CELLS = 16
NUM_PROBES = 2


def ivf_assign(
    embeddings: DataFrame, num_cells: int = NUM_CELLS, probes: int = 1
) -> DataFrame:
    """IVF cell assignment: ``(vec_id, cell, cell_rank)`` for each of the
    ``probes`` nearest centroids.

    Centroids are the first ``num_cells`` vectors by ``vec_id`` — a
    deterministic stand-in for a k-means codebook (the index structure,
    assignment, and probing are identical; only training quality
    differs, and determinism is what makes the result oracle-checkable).
    Assignment broadcasts the centroid table and ranks by cosine with a
    per-vector window — n x C products, all JVM-side.
    """
    from pyspark.sql import Window

    e = embeddings.select(
        "vec_id", "embedding", _norm_expr("embedding").alias("norm")
    )
    cent = e.filter(F.col("vec_id") < num_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    scored = e.join(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        (
            F.round(_dot_expr("embedding", "cv") / (F.col("norm") * F.col("cnorm")), 6)
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= probes)
        .select("vec_id", "cell", "cell_rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_cells: int = NUM_CELLS,
    probes: int = NUM_PROBES,
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its ``probes`` nearest cells and scores only
    those inverted lists.  The join is keyed on ``cell`` — candidate
    volume is n * probes / num_cells per query in expectation, and the
    per-cell lists shuffle once.  Same output shape as the exact/LSH
    paths so recall is directly comparable.
    """
    from pyspark.sql import Window

    # One assignment pass over the full corpus at the deeper probe count;
    # corpus membership is its rank-1 cell, queries keep all probed cells.
    assign = ivf_assign(embeddings, num_cells, probes=probes).persist()
    corpus_cells = assign.filter(F.col("cell_rank") == 1).select("vec_id", "cell")
    query_cells = (
        assign.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    e = embeddings.select(
        "vec_id", "embedding", _norm_expr("embedding").alias("norm")
    )
    corpus = e.join(corpus_cells, "vec_id")
    q = (
        e.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
        .join(query_cells, "query_id")
    )
    joined = corpus.join(
        F.broadcast(q.select("query_id", "qv", "qnorm", "cell")),
        on="cell",
    ).filter(F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot_expr("embedding", "qv") / (F.col("norm") * F.col("qnorm")), round_to
    )
    # No distinct needed: a corpus vector lives in exactly one cell, so
    # each (query, vec) pair arises from at most one probed cell.
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
    return cacheutil.materialize_and_release(topk, assign)


#: embedding dimensionality of the test corpus; callers with other dims
#: pass ``dim=`` (or ``planes=``) explicitly — no data inspection needed.
DEFAULT_DIM = 64


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes: list[list[int]] | None = None,
    dim: int = DEFAULT_DIM,
    probe_hamming: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only candidates in probed buckets.

    Multi-probe (``probe_hamming=1``, the default) scores the query's own
    bucket plus every bucket at Hamming distance 1 — the buckets most
    likely to hold true neighbors that fell on the other side of one
    hyperplane.  This closes most of the <k-rows recall hole of
    single-probe (``probe_hamming=0``) for num_planes+1 bucket reads
    instead of 1; corpus buckets partition the corpus, so the probed
    candidate sets are disjoint and need no dedup.  ``dim`` sizes the
    deterministic hyperplanes when ``planes`` is not given — a plain
    parameter, so no driver-side data peek happens before the plan.
    """
    from pyspark.sql import Window

    if planes is None:
        planes = hyperplane_signs(NUM_PLANES, dim)
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1")
    e = embeddings.select(
        "vec_id",
        "embedding",
        _norm_expr("embedding").alias("norm"),
        bucket_expr("embedding", planes).alias("bucket"),
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    probe_cols = [F.col("qbucket")]
    if probe_hamming == 1:
        probe_cols += [
            F.expr(f"qbucket ^ {1 << p}") for p in range(len(planes))
        ]
    q = q.withColumn("pbucket", F.explode(F.array(*probe_cols)))
    joined = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("pbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = F.round(_dot_expr("embedding", "qv") / (F.col("norm") * F.col("qnorm")), round_to)
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def sq8_quantization_params(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension scalar-quantization parameters (min, scale) with
    scale = (max - min) / 255, i.e. 8-bit codes 0..255 per coordinate.

    One tiny aggregation job: posexplode is a generator, the groupBy
    reduces to d groups regardless of corpus size (map-side partial agg),
    and the driver receives d rows — model-sized traffic, the same
    contract as kmeans_train.  min/max of doubles are exact, so the
    params are bit-identical across engines and partitionings.
    """
    rows = (
        embeddings.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    by_dim = {r["dim"]: (r["mn"], r["mx"]) for r in rows}
    mns, scs = [], []
    for d in range(len(by_dim)):
        mn, mx = by_dim[d]
        mns.append(mn)
        scs.append((mx - mn) / 255.0 if mx > mn else 1.0)
    return mns, scs


def _dequant_expr(vec_col: str, mns: list[float], scs: list[float]) -> F.Column:
    """codes = clamp(round((x - mn)/scale), 0, 255); back to doubles as
    mn + code*scale.  All positive inputs, so Spark's HALF_UP round and
    DuckDB's half-away-from-zero agree."""
    mns_arr = "array(" + ", ".join(f"{v!r}D" for v in mns) + ")"
    scs_arr = "array(" + ", ".join(f"{v!r}D" for v in scs) + ")"
    return F.expr(
        f"transform(sequence(1, size({vec_col})), i ->"
        f" element_at({mns_arr}, i)"
        f" + least(greatest(round((cast(element_at({vec_col}, i) as double)"
        f" - element_at({mns_arr}, i)) / element_at({scs_arr}, i), 0),"
        f" 0D), 255D) * element_at({scs_arr}, i))"
    )


def sq8_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-k cosine over int8 scalar-quantized embeddings.

    The 100 TB story: a float32 corpus quantized to per-dimension 8-bit
    codes is 4x smaller in storage, cache, and shuffle — the standard
    first compression rung of large-scale vector search (SQ8 in
    FAISS/Milvus terms).  Here the codes are immediately dequantized
    inside the same codegen expression (keeping the whole plan JVM-side
    and the DuckDB oracle able to replay it exactly); a production
    deployment would persist the code arrays and defer dequantization
    the same way.  Search quality degrades only by the quantization
    error — measured as recall@k against the exact path in
    tests/test_ann_recall.py and SCALE.md.

    Output shape matches cosine_topk/lsh_topk/ivf_topk:
    (query_id, vec_id, cosine, rank) — by construction: the search IS
    cosine_topk over the dequantized vectors, so broadcast strategy,
    tie-breaking, and output schema can never drift between the exact
    and quantized paths.
    """
    mns, scs = sq8_quantization_params(embeddings)
    dequantized = embeddings.select(
        "vec_id", _dequant_expr("embedding", mns, scs).alias("embedding")
    )
    return cosine_topk(dequantized, query_ids, k=k, round_to=round_to)


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means over the embedding column; returns the trained
    centroids and the final assignment frame ``(vec_id, cluster,
    sq_dist)``.

    The iterative-training shape done Spark-native (this is how MLlib's
    own KMeans is structured):

    * **Assignment is map-side and shuffle-free**: the k·d centroid
      matrix is tiny model state, so it rides into the plan as a literal
      nested array; each row computes its k squared distances inside
      codegen (``transform`` + ``aggregate`` over the zipped arrays) and
      takes the argmin.  No join, no shuffle, no UDF.
    * **The update step is one keyed shuffle per iteration**:
      ``posexplode`` the vectors (a generator, no shuffle) and
      partial-aggregate per ``(cluster, dimension)`` — the shuffle
      carries k·d partial sums per map partition, not the corpus.
    * **The driver holds only the model** (k·d doubles per iteration),
      exactly like the reference loop structure in connected_components:
      data never collects.

    Iteration count is fixed (classic fixed-budget Lloyd) so the result
    is deterministic given the deterministic init (the k lowest-id
    vectors).  Empty clusters keep their previous centroid.

    The mean step is made *cross-engine* deterministic so an independent
    SQL replay (the DuckDB oracle) lands on identical centroids: the
    per-dimension sums accumulate exactly as DECIMAL(38,12) (double sums
    reorder under partitioning, decimals don't), and each new centroid
    coordinate is quantized to 9 decimals — coarse enough to absorb the
    1-2 ulp of engine-specific decimal->double conversion noise, fine
    enough that the trajectory is unchanged for embedding-scale values.
    """
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seeds = e.orderBy("vid").limit(k).collect()
    centroids = [list(r["v"]) for r in seeds]
    e = e.persist()

    def assign(cents: list[list[float]]) -> DataFrame:
        # SQL-parsed literal: same array-literal tree as F.lit(nested)
        # but built in one JVM parse instead of k*d py4j round trips
        # (~0.45s/iteration on this matrix — see centroid_literal)
        arr = centroid_literal(cents)
        d = e.withColumn("cents", arr)
        sq = (
            "transform(cents, c -> aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)),"
            " 0D, (acc, z) -> acc + z))"
        )
        d = d.withColumn("sq", F.expr(sq)).drop("cents")
        return d.select(
            "vid",
            "v",
            (F.expr("array_position(sq, array_min(sq))") - 1)
            .cast("int")
            .alias("cluster"),
            F.expr("array_min(sq)").alias("sq_dist"),
        )

    # The update agg reduces to at most k*d groups (512 here) no matter
    # how large the corpus is — map-side partial aggregation means the
    # reduce side only ever sees one partial row per (map task, group).
    # More reducers than ~groups/64 is pure per-task overhead, so the
    # loop clamps the shuffle conf for its own jobs (measured 3.3s ->
    # 2.6s at sf0.1) and restores the session value after.
    loop_parts = cacheutil.clamped_partitions(
        spark, (k * len(centroids[0])) // 64
    )
    try:
        with cacheutil.scoped_shuffle_partitions(spark, loop_parts):
            for _ in range(iters):
                a = assign(centroids)
                sums = (
                    a.select("cluster", F.posexplode("v").alias("dim", "x"))
                    .groupBy("cluster", "dim")
                    .agg(
                        F.sum(F.col("x").cast("decimal(38,12)")).alias("sx"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .collect()
                )
                by_cluster: dict[int, list[tuple[int, float, int]]] = {}
                for r in sums:
                    by_cluster.setdefault(r["cluster"], []).append(
                        (r["dim"], r["sx"], r["n"])
                    )
                for cid, dims in by_cluster.items():
                    vec = centroids[cid][:]
                    for dim, sx, n in dims:
                        vec[dim] = round(float(sx) / n, 9)
                    centroids[cid] = vec
    finally:
        e.unpersist()

    final = assign(centroids).select(
        "vid", "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )
    final = final.select(F.col("vid").alias(id_col), "cluster", "sq_dist")
    return centroids, final


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. '23): cluster the embedding space with
    k-means, then prune near-duplicates *within* each cluster — a point
    is dropped when a lower-id point in its cluster has cosine >= tau.

    Output: ``(vec_id, cluster, nn_cosine, keep)`` for every vector —
    ``nn_cosine`` is its max cosine to any lower-id cluster-mate (null
    for the cluster's lowest id), ``keep`` is the survival verdict.

    The scale argument IS the clustering: all-pairs cosine over n docs
    is O(n^2), but k-means first makes candidate pairs cluster-local —
    expected pair volume drops to n^2/k, and in production k is chosen
    ~ n / desired_cluster_size so per-cluster pairwise work stays
    bounded while clusters shrink as the corpus grows.  The pairwise
    join shuffles once on ``cluster`` (AQE splits any skewed mega
    cluster); the k-means phase is shuffle-light (see ``kmeans_train``:
    map-side literal-centroid assignment, k*d-row update shuffles).

    Determinism: ``kmeans_train`` is cross-engine deterministic by
    construction and the keep rule tie-breaks on ``vec_id``, so the
    whole operator is replayable in ANSI SQL (the DuckDB oracle unrolls
    the same Lloyd iterations, then the same in-cluster max-cosine).
    """
    cents, _ = kmeans_train(
        embeddings, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )
    # Assign map-side from the trained literal centroids (the same argmin
    # codegen as kmeans_train.assign) instead of joining the assignment
    # frame back on vec_id — saves two keyed shuffles and a join.
    arr = centroid_literal(cents)
    sq = (
        "transform(cents, c -> aggregate(zip_with(v, c, (x, y) ->"
        " (x - y) * (x - y)), 0D, (acc, z) -> acc + z))"
    )
    e = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            _norm_expr(vec_col).alias("norm"),
        )
        .withColumn("cents", arr)
        .withColumn("sq", F.expr(sq))
        .select(
            "vec_id",
            "v",
            "norm",
            (F.expr("array_position(sq, array_min(sq))") - 1)
            .cast("int")
            .alias("cluster"),
        )
    )
    a = e.select("vec_id", "cluster", "v", "norm")
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("cluster").alias("b_cluster"),
        F.col("v").alias("bv"),
        F.col("norm").alias("b_norm"),
    )
    # Lower-id cluster-mates only: each unordered pair is scored once,
    # and "keep the lowest id" falls out of the join direction.
    pairs = a.join(
        b,
        (F.col("cluster") == F.col("b_cluster"))
        & (F.col("b_id") < F.col("vec_id")),
        "left",
    )
    cos = F.round(
        _dot_expr("v", "bv") / (F.col("norm") * F.col("b_norm")), round_to
    )
    return (
        pairs.select("vec_id", "cluster", cos.alias("cos"))
        .groupBy("vec_id", "cluster")
        .agg(F.max("cos").alias("nn_cosine"))
        .select(
            "vec_id",
            "cluster",
            "nn_cosine",
            F.coalesce(F.col("nn_cosine") < tau, F.lit(True)).alias("keep"),
        )
    )
