"""Windowed k-reciprocal re-ranking on the EVALUATION path
(metrics/streaming_eval.py::eval_func_streaming_reranked + the
R1mAP/engine wiring): TPU.RERANK must work past the full re-ranker's
~26k O(N^2) guard instead of hard-erroring (round-4 verdict item #1).

Oracle: the stitched ranking is materialised explicitly per query —
``rerank_topk``'s re-ranked top-r window followed by the remaining
gallery in original stable (distance, index) order — and scored with
``eval_func`` (itself np-loop-oracle-tested in tests/test_metrics.py).
The streaming evaluator must reproduce those metrics exactly without
ever building [Q, G].
"""

import jax
import numpy as np
import pytest

from centroids_reid_tpu.metrics import (
    R1mAP,
    camid_sets_to_bitmask,
    eval_func,
    eval_func_streaming_reranked,
)
from centroids_reid_tpu.metrics.r1_map import compute_distmat, l2_normalize_rows
from centroids_reid_tpu.ops.rerank import rerank_topk
from centroids_reid_tpu.parallel import make_retrieval_mesh

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)

K1, K2, LAM = 6, 3, 0.3


def _random_reid_set(seed, q=15, g=120, d=16, pids=7, cams=4):
    rng = np.random.RandomState(seed)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, pids, q)
    g_pids = rng.randint(0, pids, g)
    q_camids = rng.randint(0, cams, q)
    g_camids = rng.randint(0, cams, g)
    q_pids[0] = pids + 5          # a query with zero positives
    return qf, gf, q_pids, g_pids, q_camids, g_camids


def _stitched_oracle(qf, gf, q_pids, g_pids, q_camids, g_camids, r,
                     dist="euclidean", respect_camids=False, max_rank=50):
    """Materialise the stitched ranking explicitly and score it with the
    (oracle-tested) eval_func: window = rerank_topk order, tail = the
    original stable argsort minus the window entries."""
    _, ridx = rerank_topk(qf, gf, r=r, k1=K1, k2=K2, lambda_value=LAM,
                          dist=dist)
    ridx = np.asarray(ridx)
    distmat = compute_distmat(qf, gf, dist)
    orig = np.argsort(distmat, axis=1, kind="stable")
    stitched = np.empty_like(orig)
    for i in range(qf.shape[0]):
        win = set(ridx[i].tolist())
        tail = [j for j in orig[i] if j not in win]
        stitched[i] = np.concatenate(
            [ridx[i].astype(orig.dtype), np.asarray(tail, orig.dtype)]
        )
    return eval_func(stitched, q_pids, g_pids, q_camids, g_camids,
                     max_rank, respect_camids)


def _assert_same(m1, m2):
    assert m1.mAP == pytest.approx(m2.mAP, abs=1e-6)
    np.testing.assert_allclose(m1.cmc, m2.cmc, atol=1e-6)
    np.testing.assert_allclose(m1.all_topk, m2.all_topk, atol=1e-6)
    np.testing.assert_array_equal(
        m1.single_performance[:, 0], m2.single_performance[:, 0]
    )
    np.testing.assert_allclose(
        m1.single_performance[:, 2], m2.single_performance[:, 2], atol=1e-6
    )


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
@pytest.mark.parametrize("r", [8, 40])
def test_streaming_reranked_matches_stitched_oracle(dist, r):
    data = _random_reid_set(0)
    m_ref = _stitched_oracle(*data, r=r, dist=dist)
    m_str = eval_func_streaming_reranked(
        *data, r=r, k1=K1, k2=K2, lambda_value=LAM, dist=dist, g_chunk=32
    )
    _assert_same(m_str, m_ref)


def test_streaming_reranked_full_window_is_pure_rerank_order():
    """r >= G: the stitched ranking IS the windowed re-ranked order of
    the whole gallery (empty tail) — the 'stitched == full-rerank'
    equivalence the semantics promise."""
    data = _random_reid_set(1, q=9, g=60)
    qf, gf = data[:2]
    _, ridx = rerank_topk(qf, gf, r=gf.shape[0], k1=K1, k2=K2,
                          lambda_value=LAM)
    m_ref = eval_func(np.asarray(ridx), *data[2:], 50, False)
    m_str = eval_func_streaming_reranked(
        *data, r=gf.shape[0] + 25, k1=K1, k2=K2, lambda_value=LAM,
        g_chunk=16,
    )
    _assert_same(m_str, m_ref)


def test_streaming_reranked_respect_camids_bitmasks():
    """Centroid-protocol junk removal (bitmask membership) must apply
    identically inside and outside the window."""
    rng = np.random.RandomState(2)
    q, g, d = 11, 53, 8
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, 5, q)
    g_pids = rng.randint(0, 5, g)
    q_camids = rng.randint(0, 4, q)
    cam_sets = [rng.choice(4, rng.randint(1, 4), replace=False)
                for _ in range(g)]
    g_masks = camid_sets_to_bitmask(cam_sets)
    m_ref = _stitched_oracle(qf, gf, q_pids, g_pids, q_camids, g_masks,
                             r=12, respect_camids=True)
    m_str = eval_func_streaming_reranked(
        qf, gf, q_pids, g_pids, q_camids, g_masks, r=12, k1=K1, k2=K2,
        lambda_value=LAM, respect_camids=True, g_chunk=16,
    )
    _assert_same(m_str, m_ref)


def test_streaming_reranked_pid_heavy_large_gallery():
    """The scale regime the feature exists for: a gallery far past the
    full re-ranker's guard where one pid dominates (H = positives per
    query spans many device tiles). The streaming+windowed path must
    agree with the explicit stitched oracle."""
    from centroids_reid_tpu.metrics.streaming_eval import _H_CHUNK

    rng = np.random.RandomState(3)
    q, d = 6, 8
    heavy = 2 * _H_CHUNK + 31
    g_pids = np.concatenate(
        [np.zeros(heavy, np.int64), rng.randint(1, 6, 30_000 - heavy)]
    )
    g = len(g_pids)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = np.array([0, 0, 1, 2, 3, 9])
    q_camids = rng.randint(0, 3, q)
    g_camids = rng.randint(0, 3, g)
    r = 64
    m_ref = _stitched_oracle(qf, gf, q_pids, g_pids, q_camids, g_camids,
                             r=r)
    m_str = eval_func_streaming_reranked(
        qf, gf, q_pids, g_pids, q_camids, g_camids, r=r, k1=K1, k2=K2,
        lambda_value=LAM, g_chunk=4096,
    )
    _assert_same(m_str, m_ref)


@needs_mesh
def test_streaming_reranked_sharded_matches_single_device():
    """mesh= shards both the rank counting AND the candidate-window
    retrieval over the gallery axis; metrics must match the single-device
    path exactly."""
    data = _random_reid_set(4, q=9, g=208)
    mesh = make_retrieval_mesh(8)
    m_ref = eval_func_streaming_reranked(
        *data, r=16, k1=K1, k2=K2, lambda_value=LAM, g_chunk=16
    )
    m_sh = eval_func_streaming_reranked(
        *data, r=16, k1=K1, k2=K2, lambda_value=LAM, g_chunk=16, mesh=mesh
    )
    _assert_same(m_sh, m_ref)


def test_r1map_windowed_rerank_routing():
    """R1mAP(rerank=True, rerank_window=r) routes through the windowed
    streaming evaluator (feat_norm applied first), regardless of gallery
    size or the streaming flag."""
    rng = np.random.RandomState(5)
    n_q, n_g, d = 12, 70, 10
    feats = rng.randn(n_q + n_g, d).astype(np.float32)
    pids = rng.randint(0, 6, n_q + n_g)
    camids = rng.randint(0, 3, n_q + n_g)
    nf = l2_normalize_rows(feats.astype(np.float32))
    m_ref = eval_func_streaming_reranked(
        nf[:n_q], nf[n_q:], pids[:n_q], pids[n_q:], camids[:n_q],
        camids[n_q:], r=10, k1=20, k2=6, lambda_value=0.3,
    )
    for streaming in (None, False, True):
        ev = R1mAP(n_q, feat_norm=True, rerank=True, rerank_window=10,
                   streaming=streaming)
        m = ev.compute(feats, pids, camids)
        _assert_same(m, m_ref)
        with pytest.raises(RuntimeError):
            ev.last_distmat  # never materialised on this path


def test_windowed_rerank_improves_noisy_clusters():
    """The accuracy story survives windowing: on the overlapping-cluster
    fixture the windowed evaluator must beat the raw ranking (same regime
    as test_rerank.py::test_rerank_improves_noisy_clusters)."""
    from test_rerank import _clustered

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
               rerank_k1=10, rerank_k2=5, rerank_window=40).compute(
        feats, pids, camids
    )
    assert base.mAP < 0.95
    assert rr.mAP > base.mAP + 0.05


def test_rerank_cfg_wiring_windowed():
    """TPU.RERANK + TPU.RERANK_WINDOW drive the engine evaluation path to
    the windowed evaluator (engine/evaluate.py)."""
    from test_rerank import _clustered

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
    cfg.TPU.RERANK_WINDOW = 15
    m = compute_reid_metrics(
        cfg, feats, pids, camids, num_query=len(q_pids), use_centroids=False
    )
    ref = R1mAP(num_query=len(q_pids), feat_norm=True, rerank=True,
                rerank_k1=8, rerank_k2=4, rerank_window=15).compute(
        feats, pids, camids
    )
    assert m.mAP == pytest.approx(ref.mAP, abs=1e-6)
    np.testing.assert_allclose(m.cmc, ref.cmc, atol=1e-6)


# ---------------------------------------------------------------------
# startup validation (engine/evaluate.py::validate_rerank_config)
# ---------------------------------------------------------------------

class _FakeDataset:
    def __init__(self, query, gallery):
        from centroids_reid_tpu.data.datasets import Record

        self.val = [Record(f"q{i}", p, c, i)
                    for i, (p, c) in enumerate(query)]
        self.val += [Record(f"g{i}", p, c, i)
                     for i, (p, c) in enumerate(gallery)]
        self.num_query = len(query)


def _big_fake_dataset(n_gallery):
    rng = np.random.RandomState(0)
    query = [(int(p), int(c)) for p, c in
             zip(rng.randint(0, 50, 20), rng.randint(0, 4, 20))]
    gallery = [(int(p), int(c)) for p, c in
               zip(rng.randint(0, 50, n_gallery),
                   rng.randint(0, 4, n_gallery))]
    return _FakeDataset(query, gallery)


def test_validate_rerank_config_rejects_oversized_full_rerank():
    """A training run with full re-ranking and a streaming-scale val set
    must die AT STARTUP with the fix in the message, not hours in at its
    first EVAL_PERIOD evaluation."""
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine.evaluate import validate_rerank_config
    from centroids_reid_tpu.ops.rerank import DEFAULT_MAX_N

    cfg = get_default_cfg()
    cfg.TPU.RERANK = True
    ds = _big_fake_dataset(DEFAULT_MAX_N + 100)
    with pytest.raises(ValueError, match="RERANK_WINDOW"):
        validate_rerank_config(cfg, ds)
    # the windowed mode handles any scale — same dataset passes
    cfg.TPU.RERANK_WINDOW = 500
    validate_rerank_config(cfg, ds)
    # and with re-ranking off nothing is checked at all
    cfg.TPU.RERANK = False
    cfg.TPU.RERANK_WINDOW = 0
    validate_rerank_config(cfg, ds)


def test_validate_rerank_config_accepts_centroid_scale():
    """A raw val set past the guard whose CENTROID evaluation fits would
    still fail (the double test also evaluates without centroids) — but a
    small val set passes both modes."""
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine.evaluate import validate_rerank_config

    cfg = get_default_cfg()
    cfg.TPU.RERANK = True
    validate_rerank_config(cfg, _big_fake_dataset(500))


def test_validate_rerank_config_visualize_conflict():
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine.evaluate import validate_rerank_config

    cfg = get_default_cfg()
    cfg.TPU.RERANK = True
    cfg.TPU.RERANK_WINDOW = 100
    cfg.TEST.VISUALIZE = "yes"
    with pytest.raises(ValueError, match="VISUALIZE"):
        validate_rerank_config(cfg, _big_fake_dataset(100))


def test_centroid_gallery_rows_exact():
    """The validator's centroid-count prediction must equal the actual
    camera-aware construction's output size (metrics/centroids.py)."""
    from centroids_reid_tpu.engine.evaluate import _centroid_gallery_rows
    from centroids_reid_tpu.metrics import build_camera_aware_centroids

    rng = np.random.RandomState(7)
    n_q, n_g, d = 25, 140, 4
    pids = rng.randint(0, 9, n_q + n_g)
    camids = rng.randint(0, 5, n_q + n_g)
    emb = rng.randn(n_q + n_g, d).astype(np.float32)
    es = build_camera_aware_centroids(emb, pids, camids, n_q)
    predicted = _centroid_gallery_rows(
        pids[n_q:], camids[n_q:], pids[:n_q], camids[:n_q], True
    )
    assert len(es.labels) - n_q == predicted
    plain = _centroid_gallery_rows(
        pids[n_q:], camids[n_q:], pids[:n_q], camids[:n_q], False
    )
    assert plain == len(np.unique(pids[n_q:]))
