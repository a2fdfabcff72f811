"""Recall@k quality bounds for the approximate ANN paths.

The DuckDB oracles prove ann_lsh/ann_ivf compute their approximation *as
specified*; these tests grade whether the approximation finds true
neighbors.  The bound runs on a planted-cluster corpus where neighbors
genuinely are close (intra-cluster cosine ≈ 0.99): random-hyperplane LSH
guarantees high bucket-collision probability only for small angles
(p_plane = 1 - θ/π, Charikar '02), so a recall floor is an operator
property there.  On the synthetic sf0.1 corpus the true top-5 cosines
average 0.37 (θ ≈ 68°, p_plane ≈ 0.62, same-bucket ≈ 0.62^8 ≈ 0.02) —
no 8-plane LSH can recall those neighbors; the measured numbers live in
SCALE.md and tools/ann_recall.py, and IVF (recall 0.98 there) is the
scale path for weakly-structured embeddings."""

from __future__ import annotations

import numpy as np
import pytest

from hbase_tohdfs_spark.operators import similarity
from tools.ann_recall import recall_at_k

N_CLUSTERS = 10
PER_CLUSTER = 20
DIM = 64
QUERY_IDS = list(range(N_CLUSTERS))  # ids 0..9 land in clusters 0..9


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(N_CLUSTERS * PER_CLUSTER):
        c = i % N_CLUSTERS  # interleaved: ids < 16 cover all clusters,
        # so the IVF codebook (first num_cells ids) spans every cluster
        v = centers[c] + 0.05 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>").persist()


@pytest.fixture(scope="module")
def exact(clustered):
    return similarity.cosine_topk(clustered, QUERY_IDS, k=5).persist()


def test_multiprobe_lsh_recall_floor(clustered, exact):
    planes = similarity.hyperplane_signs(similarity.NUM_PLANES, DIM)
    approx = similarity.lsh_topk(
        clustered, QUERY_IDS, k=5, planes=planes, probe_hamming=1
    )
    assert recall_at_k(exact, approx, 5) >= 0.8


def test_multiprobe_beats_single_probe(clustered, exact):
    planes = similarity.hyperplane_signs(similarity.NUM_PLANES, DIM)
    r = {
        p: recall_at_k(
            exact,
            similarity.lsh_topk(
                clustered, QUERY_IDS, k=5, planes=planes, probe_hamming=p
            ),
            5,
        )
        for p in (0, 1)
    }
    assert r[1] >= r[0]


def test_ivf_recall_floor(clustered, exact):
    approx = similarity.ivf_topk(clustered, QUERY_IDS, k=5, probes=2)
    assert recall_at_k(exact, approx, 5) >= 0.8


def test_sq8_recall_floor(clustered, exact):
    """8-bit scalar quantization perturbs each coordinate by at most
    scale/2 ≈ (max-min)/510 — tiny against intra-cluster distances — so
    SQ8 should be the *highest*-recall approximate path (it searches
    exhaustively; only the scores are quantized)."""
    approx = similarity.sq8_topk(clustered, QUERY_IDS, k=5)
    assert recall_at_k(exact, approx, 5) >= 0.95

# ---------------------------------------------------------------------------
# Embedding-dedup LSH path: MEASURED recall vs the exact path (r6 verdict
# task 1 — the routed >1M-vector path previously shipped on the analytic
# collision formula alone).


def test_lsh_params_scale_with_corpus():
    """planes ~ log2(n) - 4 bounds the expected bucket size (~16) so the
    candidate stage stays linear in n; num_tables grows to compensate
    the per-table collision loss so target recall holds at every n."""
    from hbase_tohdfs_spark.operators.dedup import _lsh_params
    import math

    for n, want_planes in ((100, 8), (4096, 8), (100_000, 13), (2_000_000, 17)):
        planes, tables = _lsh_params(n, threshold=0.99)
        assert planes == want_planes, (n, planes)
        # analytic recall at the threshold must meet the 0.99 target
        p_plane = 1 - math.acos(0.99) / math.pi
        recall = 1 - (1 - p_plane**planes) ** tables
        assert recall >= 0.99, (n, planes, tables, recall)
        # expected bucket size bounded => candidates/doc bounded
        assert n / 2**planes <= 16.5, (n, planes)


def test_embedding_dedup_lsh_recall_measured(spark):
    """Planted-duplicate corpus at the scale-path's own parameters: the
    LSH-pruned path must recover >= 95% of the pairs the exact path
    finds (analytic prediction ~0.998 at planted cosine ~0.996), and —
    because candidates are exact-verified — report no pair the exact
    path would not."""
    from hbase_tohdfs_spark.operators import dedup

    rng = np.random.default_rng(23)
    n_base, n_dup, dim = 3000, 150, 32
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    step = n_base // n_dup
    for j in range(n_dup):
        i = j * step
        w = base[i] + 0.015 * rng.normal(size=dim)  # cosine ~0.996
        rows.append((1_000_000 + i, [float(x) for x in w]))
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    ).persist()

    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in dedup.embedding_dup_pairs(
            emb, threshold=0.99, method="exact"
        ).collect()
    }
    assert len(exact) >= 0.9 * n_dup  # the corpus really contains dups
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in dedup.embedding_dup_pairs(
            emb, threshold=0.99, method="lsh"
        ).collect()
    }
    assert lsh <= exact  # exact verify on candidates => no false pairs
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.95, (recall, len(exact), len(lsh))
    emb.unpersist()


def test_lsh_params_refuse_unreachable_recall(spark):
    """Sign-LSH cannot prune wide angles: at threshold 0.45 past the
    envelope the table count needed for 0.99 recall is ~10^3-10^4, so an
    EXPLICIT method="lsh" must RAISE with the achievable recall instead
    of silently delivering ~2% (r7 review finding).  The auto-route no
    longer errors: it falls through to the IVF-clustered path (r7
    verdict task 4), with the warning naming the route and its
    data-dependent recall."""
    import pytest

    from hbase_tohdfs_spark.operators import dedup
    from hbase_tohdfs_spark.operators.dedup import _lsh_params

    with pytest.raises(ValueError, match="achievable recall"):
        _lsh_params(2_000_000, threshold=0.45)
    # near-1 thresholds are unaffected
    assert _lsh_params(2_000_000, threshold=0.99) == (17, 8)
    # an explicit (low) target is honored instead of raising
    planes, tables = _lsh_params(2_000_000, threshold=0.45, target_recall=0.01)
    assert tables <= 32

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 1.0]) for i in range(40)],
        "vec_id: long, embedding: array<double>",
    ).persist()
    # explicit method="lsh" surfaces the refusal end-to-end
    with pytest.raises(ValueError, match="achievable recall"):
        dedup.embedding_dup_pairs(emb, threshold=0.45, method="lsh").collect()
    # the auto-route past the envelope goes to IVF instead of raising,
    # and says so
    with pytest.warns(UserWarning, match="ivf"):
        out = dedup.embedding_dup_pairs(
            emb, threshold=0.45, max_exact_vectors=10
        ).collect()
    # IVF pairs are exact-verified: every emitted pair really clears the
    # threshold per the exact path
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in dedup.embedding_dup_pairs(
            emb, threshold=0.45, method="exact"
        ).collect()
    }
    assert {(r["vec_id_a"], r["vec_id_b"]) for r in out} <= exact
    emb.unpersist()


def test_explicit_high_target_recall_blocks_ivf_fallback(spark):
    """ADVICE r8: the warn-and-route IVF fallback cannot enforce ANY
    recall target, so an EXPLICIT target_recall > 0.9 must surface as a
    raise (the caller stated a contract the route can't honor), while
    the unset default keeps the warn-and-route behavior."""
    import pytest

    from hbase_tohdfs_spark.operators import dedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 1.0]) for i in range(40)],
        "vec_id: long, embedding: array<double>",
    )
    with pytest.raises(ValueError, match="explicitly requested"):
        dedup.embedding_dup_pairs(
            emb, threshold=0.45, max_exact_vectors=10, target_recall=0.99
        )
    # unset target still warn-routes, and the warning says the default
    # target is unenforced on the ivf route
    with pytest.warns(UserWarning, match="UNENFORCED"):
        dedup.embedding_dup_pairs(
            emb, threshold=0.45, max_exact_vectors=10
        )


def test_ivf_probe_clamp_small_codebook(spark, monkeypatch):
    """ADVICE r8: a crc32-sampled training frame can yield fewer rows
    than num_cells; kmeans_train then returns a smaller codebook and an
    unclamped probe width would IndexError inside argpartition.  Force
    that regime with a tiny train cap and require a clean run."""
    from hbase_tohdfs_spark.operators import dedup

    monkeypatch.setattr(dedup, "_IVF_TRAIN_CAP", 4)
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    # must not raise even though the sampled codebook is smaller than
    # the default probe width (8)
    dedup.embedding_dup_pairs(emb, threshold=0.45, method="ivf").collect()


def test_ivf_probes_scale_with_explicit_num_cells():
    """An explicit num_cells must raise the probe width to hold the
    measured coverage floor (1/64): recall was 0.861 at 0.8% coverage
    vs 0.982 at 1.6% on the 1000-true-topic 500k probe (SCALE.md r9)."""
    from hbase_tohdfs_spark.operators.dedup import _ivf_probes_for

    assert _ivf_probes_for(1000, 8) == 16   # ceil(1000/64)
    assert _ivf_probes_for(256, 8) == 8     # cap already covers 3%
    assert _ivf_probes_for(2048, 8) == 32
    assert _ivf_probes_for(100, 8) == 8     # never lowers the width


def test_ivf_route_recall_wide_angle(spark):
    """The wide-angle regime the IVF route exists for (r7 verdict task
    4): a TOPICAL corpus (the structure real embedding corpora have)
    with near-dup pairs planted at cosine ~0.45-0.65 — angles where
    sign-LSH's collision probability makes target recall unreachable.
    The clustered codebook + multi-probe assignment must recover >= 0.9
    of the exact path's pairs at threshold 0.45, with zero false
    positives (candidates are exact-verified)."""
    from hbase_tohdfs_spark.operators import dedup

    rng = np.random.default_rng(41)
    n_topics, per_topic, dim = 40, 30, 32
    centers = rng.normal(size=(n_topics, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # sigma ~0.75 puts intra-topic member cosines around 0.45-0.75:
    # cos ~= 1 / (1 + sigma^2) in expectation for unit centers
    for t in range(n_topics):
        for _ in range(per_topic):
            v = centers[t] + 0.75 * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # background noise: vectors with no planted structure
    for _ in range(800):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    ).persist()

    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in dedup.embedding_dup_pairs(
            emb, threshold=0.45, method="exact"
        ).collect()
    }
    assert len(exact) >= 500, len(exact)  # the corpus really has wide pairs
    ivf = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in dedup.embedding_dup_pairs(
            emb, threshold=0.45, method="ivf"
        ).collect()
    }
    assert ivf <= exact  # exact verify => no false positives
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(ivf))
    emb.unpersist()
