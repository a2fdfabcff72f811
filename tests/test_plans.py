"""Physical-plan assertions: the scale properties the engine depends on
(pushdown, pruning, broadcast, partial aggregation) locked in as tests so
a regression shows up as a failure, not as a 100x slowdown at 100 TB.

These inspect the *executed* plan string of real queries on the sf0.001
test data.
"""

from __future__ import annotations

import pytest

from hbase_tohdfs_spark.queries import REGISTRY


def _plan(spark, sf_dir, name):
    import contextlib
    import io

    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q6_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    # Range predicates reach the parquet scan...
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    # ...and the scan reads only the 4 referenced columns.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema
    assert "l_comment" not in read_schema


def test_tpch_q3_broadcasts_filtered_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3")
    assert "BroadcastExchange" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed into the scan


def test_pivot_prunes_qualifiers_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pivot_last_event_by_user")
    # The qualifier projection (P3) must reach the scan as an In filter:
    # undeclared qualifiers are dropped before any exchange.
    assert "In(event_type" in plan


def test_aggregates_are_partial_then_final(spark, sf_dir):
    """Map-side combine: every groupBy runs partial aggregation before
    the exchange (keys collapse early, shuffle carries aggregates)."""
    plan = _plan(spark, sf_dir, "tpch_q1")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial_count" in plan


def test_whole_stage_codegen_covers_scan_and_agg(spark, sf_dir):
    import contextlib
    import io

    df = REGISTRY["tpch_q1"].fn(spark, sf_dir)
    df.collect()  # AQE annotates codegen stages only in the final plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "codegen id" in plan


def test_generator_has_no_scan_and_n_partitions(spark):
    """G1 synthesizes its parallelism like NMapInputFormat: a Range seed
    with exactly the requested task count, no input scan."""
    from hbase_tohdfs_spark import generate

    cells = generate.populate_cells(spark, 4, 100, "plans")
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert "Range" in plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """100 TB posture: when a selective dim-side filter feeds a SHUFFLE
    join, Spark's runtime bloom filter semi-join-reduces the fact scan
    before the exchange (InjectRuntimeFilter). Local test files sit
    below the application-side size threshold, so the thresholds are
    pinned to demonstrate the mechanism; at cluster scale the defaults
    (10 GB app side) fire on their own."""
    from pyspark.sql import functions as F

    saved_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    thr_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    saved_thr = spark.conf.get(thr_key)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(thr_key, "0")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)
        spark.conf.set(thr_key, saved_thr)


def test_partitioned_layout_prunes_at_planning_time(spark, sf_dir, tmp_path):
    """100 TB posture: a date-partitioned lake layout turns a date filter
    into partition pruning — the pruned directories are never listed as
    input, which is the difference between scanning a day and scanning
    a decade. Asserts the filter lands in PartitionFilters (not a
    post-scan Filter) and that the scan reads only matching partitions."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_by_month")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("o_month").parquet(out)

    df = spark.read.parquet(out).filter(F.col("o_month") == "1996-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "1996-03" in plan.split("PartitionFilters", 1)[1][:200]
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == "1996-03")
        .count()
    )
    assert df.count() == expected


def test_bloom_build_pushes_segment_filter(spark, sf_dir):
    """The bloom build side's segment predicate reaches the customer
    scan, and the probe pre-filter stays join-free (the only join in the
    stats query is the broadcast truth join)."""
    plan = _plan(spark, sf_dir, "bloom_semijoin")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_hll_partial_aggregates_registers(spark, sf_dir):
    """Both HLL aggregation levels combine map-side: the shuffle carries
    at most m partial registers per group, never raw rows."""
    plan = _plan(spark, sf_dir, "hll_distinct_users")
    assert "partial_max" in plan or "partial_count" in plan
    assert plan.count("HashAggregate") >= 4  # two partial+final pairs


def test_scd2_single_keyed_exchange_for_windows(spark, sf_dir):
    """All three window functions (lag, lead, row_number) must share one
    hash exchange on user_id — the change filter preserves partitioning,
    so no re-shuffle between the window passes."""
    plan = _plan(spark, sf_dir, "scd2_user_state")
    assert plan.count("hashpartitioning(user_id") == 1


def test_semdedup_assignment_stays_map_side(spark, sf_dir):
    """Cluster assignment must come from literal centroids on the scan,
    never from joining an assignment frame: the only join key in the
    pairwise stage is `cluster`."""
    plan = _plan(spark, sf_dir, "semdedup")
    assert "CartesianProduct" not in plan
    # the pairwise join is keyed on cluster; the b_id < vec_id bound is
    # only ever a post-join condition, never an equi-key
    assert "Left keys [1]: [cluster" in plan
    # no join EQUI-keyed on vec_id (the old assignment-frame join shape)
    for line in plan.splitlines():
        if "keys [" in line and "vec_id" in line:
            raise AssertionError(f"assignment join leaked back: {line}")


def _walk_physical(jnode, out):
    """Collect (nodeName, firstLine) over the TOP-LEVEL physical tree:
    descends AdaptiveSparkPlan wrappers and materialized query stages,
    stops at InMemoryTableScan (a cached input's internal plan doesn't
    re-execute, so its exchanges don't count against the contract)."""
    name = jnode.nodeName()
    out.append((name, jnode.toString().splitlines()[0]))
    if name.startswith("InMemoryTableScan"):
        return
    if name == "AdaptiveSparkPlan":
        _walk_physical(jnode.executedPlan(), out)
        return
    if name.endswith("QueryStage"):
        _walk_physical(jnode.plan(), out)
        return
    children = jnode.children()
    for i in range(children.size()):
        _walk_physical(children.apply(i), out)


def test_components_round_elides_input_exchanges(spark):
    """r11 verdict task 4: the components loop's per-round contract —
    with the edge set cached as HashPartitioning(v, n) and labels cached
    as HashPartitioning(lu, n) under the loop clamp, a propagation
    round's ONLY shuffle exchange is the neighbor-min partial agg on
    ``u``; neither cached input is ever re-exchanged (that re-exchange
    ran every round before r12, on identical cached rows)."""
    from pyspark.sql import functions as F

    from hbase_tohdfs_spark.operators import cacheutil, dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 2)], "doc_id_a int, doc_id_b int"
    )
    raw = pairs.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
    raw = raw.union(raw.select(F.col("v").alias("u"), F.col("u").alias("v")))
    with cacheutil.scoped_shuffle_partitions(spark, 4):
        edges = raw.repartition(4, "v").persist()
        labels = (
            edges.select(F.col("u").alias("lu"))
            .distinct()
            .withColumn("component", F.col("lu"))
            .persist()
        )
        try:
            rnd = dedup._propagation_round(edges, labels, 0)
            rnd.count()  # materialize caches + finalize the adaptive plan
            nodes: list = []
            _walk_physical(rnd._jdf.queryExecution().executedPlan(), nodes)
            shuffles = [line for name, line in nodes if name == "Exchange"]
            assert len(shuffles) == 1, shuffles
            assert "hashpartitioning(u#" in shuffles[0].replace(" ", "")[:60] or (
                "hashpartitioning(u" in shuffles[0]
            ), shuffles[0]
            # both cached inputs feed the round through InMemoryTableScan
            scans = [n for n, _ in nodes if n.startswith("InMemoryTableScan")]
            assert len(scans) >= 3  # edges once, labels twice
        finally:
            edges.unpersist()
            labels.unpersist()
