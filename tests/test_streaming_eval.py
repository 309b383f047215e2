"""Streaming (never-materialise-[Q,G]) evaluation vs the argsort oracle.

The materialising path (R1mAP -> jnp.argsort -> eval_func) is itself
oracle-tested against the reference's per-query python loop
(tests/test_metrics.py, np_oracle.py), so exact agreement with it — tie
order included — proves the streaming rank-counting math."""

import jax
import numpy as np
import pytest

from centroids_reid_tpu.metrics import (
    R1mAP,
    camid_sets_to_bitmask,
    eval_func,
    eval_func_streaming,
)
from centroids_reid_tpu.metrics.r1_map import compute_distmat
from centroids_reid_tpu.parallel import make_retrieval_mesh

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def _random_reid_set(seed, q=23, g=157, d=16, pids=9, cams=4):
    rng = np.random.RandomState(seed)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, pids, q)
    g_pids = rng.randint(0, pids, g)
    q_camids = rng.randint(0, cams, q)
    g_camids = rng.randint(0, cams, g)
    # a pid absent from the gallery -> a query with zero positives
    q_pids[0] = pids + 5
    return qf, gf, q_pids, g_pids, q_camids, g_camids


def _oracle(qf, gf, q_pids, g_pids, q_camids, g_camids, dist,
            respect_camids=False, max_rank=50):
    import jax.numpy as jnp

    distmat = compute_distmat(qf, gf, dist)
    indices = jnp.argsort(jnp.asarray(distmat), axis=1)
    return eval_func(indices, q_pids, g_pids, q_camids, g_camids,
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
def test_streaming_matches_argsort_eval(dist):
    data = _random_reid_set(0)
    m_ref = _oracle(*data, dist)
    m_str = eval_func_streaming(*data, dist=dist, g_chunk=32)
    _assert_same(m_str, m_ref)


def test_streaming_with_ties():
    """Duplicate gallery embeddings: rank order of equal distances must
    match the stable argsort (lexicographic (distance, index) counting)."""
    qf, gf, q_pids, g_pids, q_camids, g_camids = _random_reid_set(1, g=96)
    gf[10] = gf[40] = gf[77]          # three identical rows
    g_pids[10] = g_pids[40] = g_pids[77]
    m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_camids, "euclidean")
    m_str = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_camids, g_chunk=32
    )
    _assert_same(m_str, m_ref)


def test_streaming_respect_camids_bitmasks():
    """Centroid-style eval: gallery camids are SETS (bitmasks), removal is
    membership of the query camid (eval_reid.py:52-55)."""
    rng = np.random.RandomState(2)
    q, g, d = 17, 61, 8
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, 6, q)
    g_pids = rng.randint(0, 6, g)
    q_camids = rng.randint(0, 4, q)
    cam_sets = [rng.choice(4, rng.randint(1, 4), replace=False)
                for _ in range(g)]
    g_masks = camid_sets_to_bitmask(cam_sets)
    m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_masks,
                    "euclidean", respect_camids=True)
    m_str = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_masks,
        respect_camids=True, g_chunk=16,
    )
    _assert_same(m_str, m_ref)


def test_streaming_respect_camids_high_camera_ids():
    """Cameras above 30 exercise the two-word bitmask path (bits 31-61
    live in the high int32 word; see eval_reid.split_camid_words) —
    streaming must agree with the (np-loop-anchored) eval_func."""
    rng = np.random.RandomState(7)
    q, g, d = 13, 47, 8
    cams = [0, 5, 30, 31, 40, 62]
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, 5, q)
    g_pids = rng.randint(0, 5, g)
    q_camids = np.array([cams[i] for i in rng.randint(0, len(cams), q)])
    cam_sets = [
        rng.choice(cams, rng.randint(1, 4), replace=False)
        for _ in range(g)
    ]
    g_masks = camid_sets_to_bitmask(cam_sets)
    m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_masks,
                    "euclidean", respect_camids=True)
    m_str = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_masks,
        respect_camids=True, g_chunk=16,
    )
    _assert_same(m_str, m_ref)


def test_r1map_streaming_switch_equivalence():
    """R1mAP with streaming forced on == the default materialising path
    (same feats/pids/camids, num_query split)."""
    rng = np.random.RandomState(3)
    n_q, n_g, d = 19, 83, 12
    feats = rng.randn(n_q + n_g, d).astype(np.float32)
    pids = rng.randint(0, 7, n_q + n_g)
    camids = rng.randint(0, 3, n_q + n_g)
    m_mat = R1mAP(n_q, feat_norm=True).compute(feats, pids, camids)
    ev = R1mAP(n_q, feat_norm=True, streaming=True)
    m_str = ev.compute(feats, pids, camids)
    _assert_same(m_str, m_mat)
    with pytest.raises(RuntimeError):
        ev.last_distmat


@needs_mesh
def test_streaming_sharded_matches_single_device():
    """Gallery rows sharded over the 8-device mesh: identical metrics."""
    data = _random_reid_set(4, q=11, g=210)
    mesh = make_retrieval_mesh(8)
    m_ref = eval_func_streaming(*data, g_chunk=16)
    m_sh = eval_func_streaming(*data, g_chunk=16, mesh=mesh)
    _assert_same(m_sh, m_ref)


@needs_mesh
def test_streaming_sharded_respect_camids_cosine():
    """Sharded path under the centroid protocol (bitmask camids, membership
    removal) and cosine distance — the psum'd extract/count must agree with
    the single-device stream and the argsort oracle."""
    rng = np.random.RandomState(5)
    q, g, d = 13, 190, 8
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = rng.randint(0, 6, q)
    g_pids = rng.randint(0, 6, g)
    q_camids = rng.randint(0, 4, q)
    cam_sets = [rng.choice(4, rng.randint(1, 4), replace=False)
                for _ in range(g)]
    g_masks = camid_sets_to_bitmask(cam_sets)
    mesh = make_retrieval_mesh(8)
    for dist in ("euclidean", "cosine"):
        m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_masks,
                        dist, respect_camids=True)
        m_sh = eval_func_streaming(
            qf, gf, q_pids, g_pids, q_camids, g_masks,
            respect_camids=True, dist=dist, g_chunk=16, mesh=mesh,
        )
        _assert_same(m_sh, m_ref)


def test_streaming_pid_heavy_gallery_multiple_h_tiles():
    """The regime streaming eval exists for: one pid dominates the gallery,
    so H = max positives per query far exceeds one _H_CHUNK tile. The
    extract/count passes must tile the positives axis (device memory flat
    in H) and still match the argsort oracle exactly — including the
    lexsort-based hrank/AP math on a query with hundreds of hits."""
    from centroids_reid_tpu.metrics.streaming_eval import _H_CHUNK

    rng = np.random.RandomState(11)
    q, d = 9, 8
    heavy = 3 * _H_CHUNK + 17            # > 3 positives tiles
    qf = rng.randn(q, d).astype(np.float32)
    g_pids = np.concatenate([np.zeros(heavy, np.int64),
                             rng.randint(1, 5, 40)])
    g = len(g_pids)
    gf = rng.randn(g, d).astype(np.float32)
    gf[5] = gf[60] = gf[100]             # ties inside the heavy pid
    q_pids = np.array([0] * 6 + [1, 2, 9])   # pid 9: zero positives
    q_camids = rng.randint(0, 3, q)
    g_camids = rng.randint(0, 3, g)
    m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_camids, "euclidean")
    m_str = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_camids, g_chunk=64
    )
    _assert_same(m_str, m_ref)


@needs_mesh
def test_streaming_pid_heavy_sharded():
    """Positives tiling under shard_map: the psum'd extract must assemble
    each hit's distance across shards before counting, with H spanning
    several tiles."""
    from centroids_reid_tpu.metrics.streaming_eval import _H_CHUNK

    rng = np.random.RandomState(12)
    q, d = 5, 8
    heavy = 2 * _H_CHUNK + 9
    g_pids = np.concatenate([np.zeros(heavy, np.int64),
                             rng.randint(1, 4, 31)])
    g = len(g_pids)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    q_pids = np.array([0, 0, 0, 1, 7])
    q_camids = rng.randint(0, 3, q)
    g_camids = rng.randint(0, 3, g)
    mesh = make_retrieval_mesh(8)
    m_ref = _oracle(qf, gf, q_pids, g_pids, q_camids, g_camids, "euclidean")
    m_sh = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_camids, g_chunk=16, mesh=mesh,
    )
    _assert_same(m_sh, m_ref)


def test_streaming_accepts_list_gallery():
    """Array-like (list-of-rows) galleries stay accepted: the max_rank
    clamp must not read ``.shape`` on the raw argument (review r5 — a
    list gallery used to crash AFTER both streaming passes finished)."""
    qf, gf, q_pids, g_pids, q_camids, g_camids = _random_reid_set(11)
    m_arr = eval_func_streaming(
        qf, gf, q_pids, g_pids, q_camids, g_camids, dist="euclidean"
    )
    m_list = eval_func_streaming(
        qf, [row for row in gf], q_pids, g_pids, q_camids, g_camids,
        dist="euclidean",
    )
    _assert_same(m_arr, m_list)
