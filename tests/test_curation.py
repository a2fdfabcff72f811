"""Unit tests for the corpus-curation operators (operators/curation.py).

The md5-bucket constants below were computed offline:
int(md5(str(i))[:15], 16) % 100 < 4 holds for doc_id 62 and 65 (eval
bucket of contamination_report) and fails for 0..9 (train bucket).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_tohdfs_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s1"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s1"),
        (3, "one two three four five six seven eight nine ten eleven twelve", "s2"),
        (4, "completely different words here nothing shared at all okay", "s3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_assign_splits_group_level(spark, docs):
    out = curation.assign_splits(docs).collect()
    by_doc = {r["doc_id"]: (r["grp"], r["split"]) for r in out}
    assert len(by_doc) == 4
    # Same group -> same split, always (leakage safety).
    assert by_doc[1][1] == by_doc[2][1]
    assert all(s in ("train", "val", "test") for _, s in by_doc.values())
    # Deterministic: a second run gives the identical assignment.
    again = {r["doc_id"]: r["split"] for r in curation.assign_splits(docs).collect()}
    assert again == {d: s for d, (_, s) in by_doc.items()}


def test_assign_splits_fractions(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.col("id").cast("string").alias("source"),
    )
    counts = {
        r["split"]: r["count"]
        for r in curation.assign_splits(df).groupBy("split").count().collect()
    }
    # 80/10/10 within generous tolerance (md5 is uniform-ish).
    assert 700 < counts.get("train", 0) < 900
    assert 40 < counts.get("val", 0) < 180
    assert 40 < counts.get("test", 0) < 180


def test_pack_sequences_layout(spark):
    # 6 docs of 100 ws-tokens each, one stream, budget 512: starts are
    # 0,100,...,500; doc starting at 500 crosses into sequence 1.
    text = " ".join(["tok"] * 100)
    df = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    out = curation.pack_sequences(df, budget=512, n_streams=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["stream"] == 0 for r in rows.values())
    starts = {d: r["seq_id"] * 512 + r["start_off"] for d, r in rows.items()}
    assert starts == {0: 0, 1: 100, 2: 200, 3: 300, 4: 400, 5: 500}
    assert [rows[d]["crosses_boundary"] for d in range(6)] == [
        False, False, False, False, False, True,
    ]
    assert rows[5]["seq_id"] == 0 and rows[5]["start_off"] == 500


def test_pack_sequences_streams_partition_independently(spark):
    text = " ".join(["tok"] * 10)
    df = spark.createDataFrame(
        [(i, text) for i in range(64)], "doc_id long, text string"
    )
    out = curation.pack_sequences(df, budget=512, n_streams=8).collect()
    # Offsets within each stream are the contiguous concat layout.
    from collections import defaultdict

    per_stream = defaultdict(list)
    for r in out:
        per_stream[r["stream"]].append(r)
    for rows in per_stream.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["seq_id"] * 512 + r["start_off"] == pos
            pos += r["n_tokens"]


def test_contamination_flags_copied_eval_doc(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (62, shared, "s"),  # eval bucket (md5 % 100 < 4)
        (1, shared, "s"),  # train doc: verbatim copy of eval doc 62
        (2, "totally unrelated text with no overlap whatsoever present", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in curation.contamination_report(docs).collect()}
    assert 1 in out and out[1]["eval_doc_id"] == 62
    assert out[1]["n_common"] == 9  # 10 tokens -> 9 distinct bigrams
    assert 2 not in out  # clean doc is not flagged
    assert 62 not in out  # eval docs are never reported as contaminated


def test_contamination_picks_strongest_eval_match(spark):
    rows = [
        (62, "a b c d e f g h i j", "s"),  # eval: 9 bigrams
        (65, "a b c d e x y z w v", "s"),  # eval: shares a prefix only
        (1, "a b c d e f g h i j", "s"),  # train: exact copy of 62
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.contamination_report(docs).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 1 and out[0]["eval_doc_id"] == 62


def test_passage_dedup_removes_repeats(spark):
    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    other = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    rows = [
        (1, f"{ten} {other}", None, None),  # chunks: [ten, other], both first
        (2, f"{ten} y1 y2 y3", None, None),  # ten repeats; partial tail is new
        (3, f"{other}", None, None),  # fully duplicate doc -> nothing kept
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["doc_id"]: r for r in curation.passage_dedup(docs).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["dedup_text"] == f"{ten} {other}"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["dedup_text"] == "y1 y2 y3"
    assert out[3]["n_chunks"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["dedup_text"] == ""


def test_passage_dedup_within_doc_repeat(spark):
    ten = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"
    docs = spark.createDataFrame(
        [(1, f"{ten} {ten}", None, None)],
        "doc_id long, text string, lang string, source string",
    )
    out = curation.passage_dedup(docs).collect()[0]
    assert out["n_chunks"] == 2 and out["n_kept"] == 1
    assert out["dedup_text"] == ten


def test_domain_rebalance_flattens_to_minority(spark):
    """The minority source is kept whole; larger sources are cut toward
    its size; the decision is deterministic across invocations."""
    from hbase_tohdfs_spark.operators.curation import domain_rebalance

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rep = {r["source"]: r for r in domain_rebalance(docs).collect()}
    assert rep["small"]["n_after"] == rep["small"]["n_before"] == 100
    # md5 buckets are uniform-ish: the big source lands near 100 docs
    assert 60 <= rep["big"]["n_after"] <= 140
    rep2 = {r["source"]: r for r in domain_rebalance(docs).collect()}
    assert rep == rep2


def test_temperature_mix_softens_between_natural_and_flat(spark):
    """alpha=0.5: the minority keeps everything (rate exactly 1.0), a 9x
    larger source keeps ~sqrt(1/9) = 1/3 of its docs — strictly more
    than the flat rebalance (1/9) and strictly less than natural (all);
    deterministic across invocations."""
    import math

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rep = {r["source"]: r for r in curation.temperature_mix(docs).collect()}
    assert rep["small"]["n_after"] == 100
    assert rep["small"]["keep_rate"] == 1.0
    assert abs(rep["big"]["keep_rate"] - math.sqrt(100 / 900)) < 1e-6
    # ~300 expected; md5 buckets are uniform-ish
    assert 240 <= rep["big"]["n_after"] <= 360
    flat = {
        r["source"]: r for r in curation.domain_rebalance(docs).collect()
    }
    assert flat["big"]["n_after"] < rep["big"]["n_after"] < 900
    rep2 = {r["source"]: r for r in curation.temperature_mix(docs).collect()}
    assert rep == rep2
