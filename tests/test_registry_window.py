"""Registry-window invariants.

The correctness driver checks only the FIRST 50 registry entries in dict
order, so window placement IS the evidence budget: these tests pin the
rotation protocol (never-yet-proven queries inside the window,
long-green shapes in the tail) so a future registration can't silently
push an unproven operator out of driver visibility."""

from __future__ import annotations

from hbase_tohdfs_spark.queries import _LONG_GREEN_TAIL, REGISTRY

DRIVER_WINDOW = 50

# Queries that had never received a driver correctness row through round
# 3 (rounds 1-2 checked positions 1-50 of the old ordering; round 3
# crashed on the events ts drift).  They must stay in the window until
# green rows exist for them.
NEEDS_EVIDENCE = [
    "dedup_embedding", "dedup_ngram_jaccard", "ann_topk", "ann_lsh",
    "ann_ivf", "text_stats", "lang_id", "doc_fingerprints",
    "multimodal_pipeline", "media_image_pipeline", "assign_splits",
    "pack_sequences", "contamination_report", "passage_dedup",
    "kmeans_assign", "curation_pipeline",
]


def test_every_entry_has_an_oracle():
    missing = [n for n, spec in REGISTRY.items() if spec.oracle is None]
    assert missing == [], f"oracle=None entries get only rows-only checks: {missing}"


def test_unproven_queries_sit_inside_driver_window():
    window = list(REGISTRY)[:DRIVER_WINDOW]
    out = [n for n in NEEDS_EVIDENCE if n not in window]
    assert out == [], f"never-driver-checked queries outside the window: {out}"


def test_tail_is_exactly_the_rotated_long_green_set():
    tail = list(REGISTRY)[DRIVER_WINDOW:]
    assert sorted(tail) == sorted(_LONG_GREEN_TAIL)


def test_bench_queries_exist():
    from bench import BENCH_QUERIES

    assert all(n in REGISTRY for n in BENCH_QUERIES)
