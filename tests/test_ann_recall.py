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
