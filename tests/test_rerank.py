"""k-reciprocal re-ranking (ops/rerank.py): oracle parity + wiring.

Beyond-parity feature — the reference has no re-ranking (no rerank /
jaccard / k_reciprocal symbol anywhere in /root/reference), so the oracle
is tests/np_oracle.py::oracle_rerank, a loop implementation of the spec
documented in the module (Zhong et al., CVPR 2017).
"""

import numpy as np
import pytest

from np_oracle import oracle_rerank

from centroids_reid_tpu.metrics import R1mAP
from centroids_reid_tpu.ops.rerank import rerank_distmat, rerank_topk


@pytest.mark.parametrize(
    "q,g,d,k1,k2,dist",
    [
        (10, 40, 16, 8, 4, "euclidean"),
        (7, 23, 8, 5, 1, "euclidean"),    # k2=1: no query expansion
        (12, 30, 16, 6, 3, "cosine"),
        (3, 5, 4, 20, 9, "euclidean"),    # k1 > N-1, k2 > N: clamp path
        (1, 9, 6, 3, 2, "euclidean"),     # single query
    ],
)
def test_rerank_matches_oracle(q, g, d, k1, k2, dist):
    rng = np.random.RandomState(42)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    for lam in (0.3, 0.0):
        ref = oracle_rerank(qf, gf, k1, k2, lam, dist)
        got = np.asarray(rerank_distmat(qf, gf, k1, k2, lam, dist))
        assert got.shape == (q, g)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rerank_lambda_one_is_normalized_original():
    """lambda=1 reproduces the (row-max normalised) original distances —
    i.e. the original ranking, exactly."""
    rng = np.random.RandomState(0)
    qf = rng.randn(9, 12).astype(np.float32)
    gf = rng.randn(31, 12).astype(np.float32)
    got = np.asarray(rerank_distmat(qf, gf, 6, 3, 1.0))
    f = np.concatenate([qf, gf])
    sq = (f * f).sum(1)
    dmat = (sq[:, None] + sq[None, :] - 2.0 * f @ f.T).astype(np.float32)
    dn = dmat / np.maximum(dmat.max(axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, dn[:9, 9:], atol=1e-5)
    assert (
        np.argsort(got, axis=1) == np.argsort(dmat[:9, 9:], axis=1)
    ).all()


def test_rerank_memory_guard_and_empty():
    rng = np.random.RandomState(0)
    with pytest.raises(ValueError, match="max_n"):
        rerank_distmat(
            rng.randn(4, 4), rng.randn(8, 4), max_n=10
        )
    assert rerank_distmat(np.zeros((0, 4)), rng.randn(5, 4)).shape == (0, 5)
    assert rerank_distmat(rng.randn(5, 4), np.zeros((0, 4))).shape == (5, 0)


def _clustered(rng, pids_q, pids_g, dim=32, noise=0.15):
    centers = rng.randn(max(max(pids_q), max(pids_g)) + 1, dim) * 3.0
    qf = np.stack([centers[p] + noise * rng.randn(dim) for p in pids_q])
    gf = np.stack([centers[p] + noise * rng.randn(dim) for p in pids_g])
    return qf.astype(np.float32), gf.astype(np.float32)


def test_rerank_r1map_integration_clean_clusters():
    """R1mAP(rerank=True) scores a cleanly clustered set perfectly and
    exposes the re-ranked matrix for visualisation."""
    rng = np.random.RandomState(1)
    q_pids = np.repeat(np.arange(6), 2)
    g_pids = np.repeat(np.arange(6), 5)
    qf, gf = _clustered(rng, q_pids, g_pids)
    feats = np.concatenate([qf, gf])
    pids = np.concatenate([q_pids, g_pids])
    camids = np.concatenate(
        [np.zeros(len(q_pids), int), np.ones(len(g_pids), int)]
    )
    ev = R1mAP(num_query=len(q_pids), feat_norm=True, rerank=True,
               rerank_k1=6, rerank_k2=3)
    m = ev.compute(feats, pids, camids)
    assert m.mAP == pytest.approx(1.0, abs=1e-6)
    assert ev.last_distmat.shape == (len(q_pids), len(g_pids))


def test_rerank_improves_noisy_clusters():
    """The canonical motivation: with moderately overlapping clusters,
    k-reciprocal gallery context recovers ranks that raw distances get
    wrong. At seed 1 / noise 2.2 the margin is large (base mAP ~0.89 vs
    ~0.99 re-ranked; every nearby seed/noise in this regime improves too,
    +0.02..+0.11 — verified by a 12-point sweep when the test was
    written), so the assertion is far from flaky."""
    rng = np.random.RandomState(1)
    q_pids = np.repeat(np.arange(8), 2)
    g_pids = np.repeat(np.arange(8), 10)
    qf, gf = _clustered(rng, q_pids, g_pids, dim=16, noise=2.2)
    feats = np.concatenate([qf, gf])
    pids = np.concatenate([q_pids, g_pids])
    camids = np.concatenate(
        [np.zeros(len(q_pids), int), np.ones(len(g_pids), int)]
    )
    base = R1mAP(num_query=len(q_pids), feat_norm=True).compute(
        feats, pids, camids
    )
    rr = R1mAP(num_query=len(q_pids), feat_norm=True, rerank=True,
               rerank_k1=10, rerank_k2=5).compute(feats, pids, camids)
    assert base.mAP < 0.95  # the set is genuinely hard (measured ~0.89)
    assert rr.mAP > base.mAP + 0.05  # measured ~+0.10


def _base_eval_dist(qf, gf, dist):
    if dist == "euclidean":
        sq_q, sq_g = (qf * qf).sum(1), (gf * gf).sum(1)
        return sq_q[:, None] + sq_g[None, :] - 2.0 * qf @ gf.T
    qn = qf / np.maximum(np.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
    gn = gf / np.maximum(np.linalg.norm(gf, axis=1, keepdims=True), 1e-12)
    return np.clip(np.abs(1.0 - qn @ gn.T), 1e-12, None)


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_rerank_topk_matches_per_query_oracle(dist):
    """Windowed re-ranking == oracle_rerank of each query against its own
    top-r candidate set (the documented per-query semantics)."""
    rng = np.random.RandomState(3)
    qf = rng.randn(6, 12).astype(np.float32)
    gf = rng.randn(40, 12).astype(np.float32)
    r, k1, k2, lam = 10, 5, 2, 0.3
    dists, inds = rerank_topk(qf, gf, r=r, k1=k1, k2=k2,
                              lambda_value=lam, dist=dist)
    dists, inds = np.asarray(dists), np.asarray(inds)
    assert dists.shape == inds.shape == (6, r)
    d0 = _base_eval_dist(qf, gf, dist)
    for i in range(len(qf)):
        cands = np.argsort(d0[i], kind="stable")[:r]
        vals = oracle_rerank(qf[i:i + 1], gf[cands], k1, k2, lam, dist)[0]
        order = np.argsort(vals, kind="stable")
        np.testing.assert_array_equal(inds[i], cands[order])
        np.testing.assert_allclose(dists[i], vals[order], atol=1e-4)


def test_rerank_topk_lambda_one_keeps_base_order():
    """lambda=1: per-set dn is a positive rescale of each query's own
    distances, so the windowed re-rank must reproduce the base top-r
    retrieval order exactly."""
    rng = np.random.RandomState(4)
    qf = rng.randn(8, 16).astype(np.float32)
    gf = rng.randn(60, 16).astype(np.float32)
    _, inds = rerank_topk(qf, gf, r=12, k1=6, k2=3, lambda_value=1.0)
    d0 = _base_eval_dist(qf, gf, "euclidean")
    base = np.argsort(d0, axis=1, kind="stable")[:, :12]
    np.testing.assert_array_equal(np.asarray(inds), base)


def test_rerank_topk_clamps_and_empty():
    rng = np.random.RandomState(0)
    qf = rng.randn(3, 8).astype(np.float32)
    gf = rng.randn(5, 8).astype(np.float32)
    # r > G clamps to G; k1/k2 beyond the set size clamp too
    dists, inds = rerank_topk(qf, gf, r=50, k1=30, k2=20)
    assert np.asarray(dists).shape == np.asarray(inds).shape == (3, 5)
    assert sorted(np.asarray(inds)[0]) == [0, 1, 2, 3, 4]
    d, i = rerank_topk(np.zeros((0, 8)), gf)
    assert np.asarray(d).shape == (0, 0) and np.asarray(i).shape == (0, 0)


def test_rerank_streaming_conflict_raises():
    rng = np.random.RandomState(0)
    feats = rng.randn(20, 8).astype(np.float32)
    ev = R1mAP(num_query=5, rerank=True, streaming=True)
    with pytest.raises(ValueError, match="streaming"):
        ev.compute(feats, np.arange(20) % 4, np.zeros(20, int))


def test_rerank_cfg_wiring_through_compute_reid_metrics():
    """TPU.RERANK drives the engine evaluation path (engine/evaluate.py):
    same metrics as calling R1mAP(rerank=True) directly."""
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine.evaluate import compute_reid_metrics

    rng = np.random.RandomState(2)
    q_pids = np.repeat(np.arange(6), 2)
    g_pids = np.repeat(np.arange(6), 6)
    qf, gf = _clustered(rng, q_pids, g_pids, dim=16, noise=2.0)
    feats = np.concatenate([qf, gf])
    pids = np.concatenate([q_pids, g_pids])
    camids = np.concatenate(
        [np.zeros(len(q_pids), int), np.ones(len(g_pids), int)]
    )
    cfg = get_default_cfg()
    cfg.TPU.RERANK = True
    cfg.TPU.RERANK_K1 = 8
    cfg.TPU.RERANK_K2 = 4
    m = compute_reid_metrics(
        cfg, feats, pids, camids, num_query=len(q_pids), use_centroids=False
    )
    ref = R1mAP(num_query=len(q_pids), feat_norm=True, rerank=True,
                rerank_k1=8, rerank_k2=4).compute(feats, pids, camids)
    assert m.mAP == pytest.approx(ref.mAP, abs=1e-6)
    assert np.allclose(m.cmc, ref.cmc)
