"""Eval subsystem tests against numpy loop oracles + miniature sanity cases."""

import numpy as np
import pytest

from np_oracle import (
    oracle_camera_aware_centroids,
    oracle_eval_func,
    oracle_plain_centroids,
)

from centroids_reid_tpu.metrics import (
    R1mAP,
    build_camera_aware_centroids,
    build_plain_centroids,
    camid_sets_to_bitmask,
    compute_distmat,
    eval_func,
)


def _mini_ranked(seed=0, q=20, g=120, n_pids=10, n_cams=4):
    rng = np.random.RandomState(seed)
    q_pids = rng.randint(0, n_pids, q)
    g_pids = rng.randint(0, n_pids, g)
    q_camids = rng.randint(0, n_cams, q)
    g_camids = rng.randint(0, n_cams, g)
    dist = rng.rand(q, g)
    indices = np.argsort(dist, axis=1)
    return indices, q_pids, g_pids, q_camids, g_camids


def test_eval_func_matches_oracle():
    indices, q_pids, g_pids, q_camids, g_camids = _mini_ranked()
    ours = eval_func(indices, q_pids, g_pids, q_camids, g_camids, 50)
    cmc, mAP, topk, singles = oracle_eval_func(
        indices, q_pids, g_pids, q_camids, g_camids, 50
    )
    np.testing.assert_allclose(ours.cmc, cmc, rtol=1e-5)
    assert ours.mAP == pytest.approx(mAP, rel=1e-5)
    np.testing.assert_allclose(ours.all_topk, topk, rtol=1e-5)
    np.testing.assert_allclose(
        ours.single_performance, singles.astype(float), rtol=1e-5
    )


def test_eval_func_respect_camids_matches_oracle():
    rng = np.random.RandomState(1)
    q, g, n_pids = 15, 60, 6
    q_pids = rng.randint(0, n_pids, q)
    g_pids = rng.randint(0, n_pids, g)
    q_camids = rng.randint(0, 4, q)
    g_cam_sets = [
        sorted(rng.choice(4, size=rng.randint(1, 4), replace=False).tolist())
        for _ in range(g)
    ]
    indices = np.argsort(rng.rand(q, g), axis=1)

    # max_rank=10: with a small gallery the oracle's per-query CMC rows
    # would be ragged at 50 (a latent reference flaw for tiny galleries)
    ours = eval_func(
        indices, q_pids, g_pids, q_camids,
        camid_sets_to_bitmask(g_cam_sets), 10, respect_camids=True,
    )
    cmc, mAP, topk, _ = oracle_eval_func(
        indices, q_pids, g_pids, q_camids, g_cam_sets, 10, respect_camids=True
    )
    np.testing.assert_allclose(ours.cmc, cmc, rtol=1e-5)
    assert ours.mAP == pytest.approx(mAP, rel=1e-5)
    np.testing.assert_allclose(ours.all_topk, topk, rtol=1e-5)


def test_eval_func_respect_camids_high_camera_ids():
    """Cameras up to 62 (the documented bitmask ceiling): x64-off JAX
    truncates int64 device arrays to int32, so the bitmask must travel as
    two 31-bit words (eval_reid.split_camid_words) — a single int32 word
    silently dropped bits >= 31 and made >> shifts >= 32 undefined."""
    rng = np.random.RandomState(4)
    q, g, n_pids = 15, 60, 5
    cams = [0, 1, 29, 30, 31, 32, 45, 61, 62]
    q_pids = rng.randint(0, n_pids, q)
    g_pids = rng.randint(0, n_pids, g)
    q_camids = np.array([cams[i] for i in rng.randint(0, len(cams), q)])
    g_cam_sets = [
        sorted(
            rng.choice(cams, size=rng.randint(1, 5), replace=False).tolist()
        )
        for _ in range(g)
    ]
    indices = np.argsort(rng.rand(q, g), axis=1)
    ours = eval_func(
        indices, q_pids, g_pids, q_camids,
        camid_sets_to_bitmask(g_cam_sets), 10, respect_camids=True,
    )
    cmc, mAP, topk, _ = oracle_eval_func(
        indices, q_pids, g_pids, q_camids, g_cam_sets, 10,
        respect_camids=True,
    )
    np.testing.assert_allclose(ours.cmc, cmc, rtol=1e-5)
    assert ours.mAP == pytest.approx(mAP, rel=1e-5)
    np.testing.assert_allclose(ours.all_topk, topk, rtol=1e-5)


def test_eval_func_drops_invalid_queries():
    """A query whose only gallery match shares pid+camid must be excluded
    (eval_reid.py:63-65)."""
    q_pids = np.array([1, 2])
    g_pids = np.array([1, 3, 4])
    q_camids = np.array([0, 0])
    g_camids = np.array([0, 1, 1])   # query 0's match removed; query 1 matches nothing
    indices = np.tile(np.arange(3), (2, 1))
    m = eval_func(indices, q_pids, g_pids, q_camids, g_camids, 3)
    # no valid queries -> zero metrics, empty singles
    assert m.single_performance.shape[0] == 0


def test_plain_centroids_match_oracle():
    rng = np.random.RandomState(2)
    emb = rng.randn(40, 8).astype(np.float32)
    labels = np.concatenate([rng.randint(0, 5, 10), rng.randint(0, 5, 30)])
    num_query = 10
    ours = build_plain_centroids(emb, labels, num_query)
    oemb, olab, ocam = oracle_plain_centroids(emb, labels, num_query)
    np.testing.assert_allclose(ours.embeddings, oemb, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ours.labels, olab)
    np.testing.assert_array_equal(ours.camids, ocam)


def test_camera_aware_centroids_match_oracle():
    rng = np.random.RandomState(3)
    emb = rng.randn(50, 8).astype(np.float32)
    labels = np.concatenate([rng.randint(0, 5, 12), rng.randint(0, 6, 38)])
    camids = rng.randint(0, 4, 50)
    num_query = 12
    ours = build_camera_aware_centroids(emb, labels, camids, num_query)
    oemb, olab, ocams = oracle_camera_aware_centroids(
        emb, labels, camids, num_query
    )
    np.testing.assert_allclose(ours.embeddings, oemb, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ours.labels, olab)
    # query rows stay plain camids; centroid rows are bitmask sets
    np.testing.assert_array_equal(ours.camids[:num_query], camids[:num_query])
    np.testing.assert_array_equal(
        ours.camids[num_query:], camid_sets_to_bitmask(ocams[num_query:])
    )


def test_r1map_perfect_clusters():
    """Tight pid clusters -> mAP == 1.0 and Rank-1 == 1.0."""
    rng = np.random.RandomState(4)
    n_pids, per_split = 8, 4
    protos = rng.randn(n_pids, 16).astype(np.float32) * 10
    q = protos.repeat(per_split, 0) + rng.randn(n_pids * per_split, 16) * 0.01
    g = protos.repeat(per_split, 0) + rng.randn(n_pids * per_split, 16) * 0.01
    feats = np.concatenate([q, g])
    pids = np.concatenate([np.arange(n_pids).repeat(per_split)] * 2)
    camids = np.concatenate([
        np.zeros(n_pids * per_split, int), np.ones(n_pids * per_split, int)
    ])
    m = R1mAP(num_query=n_pids * per_split).compute(feats, pids, camids)
    assert m.mAP == pytest.approx(1.0)
    assert m.cmc[0] == pytest.approx(1.0)


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_compute_distmat_chunking_consistent(dist):
    import centroids_reid_tpu.metrics.r1_map as r1
    rng = np.random.RandomState(5)
    qf = rng.randn(7, 12).astype(np.float32)
    gf = rng.randn(33, 12).astype(np.float32)
    full = compute_distmat(qf, gf, dist)
    old = r1._CHUNK_ELEMS
    try:
        r1._CHUNK_ELEMS = 7 * 5  # force tiny gallery chunks
        chunked = compute_distmat(qf, gf, dist)
    finally:
        r1._CHUNK_ELEMS = old
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-5)
