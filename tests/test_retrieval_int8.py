"""int8-quantized gallery retrieval vs the exact fp32 oracle.

ops/retrieval_int8.py is beyond parity (the reference's retrieval is an
fp32 distmat, /root/reference/inference/get_similar.py:112-119); its
oracle is the repo's own exact path ``ops.retrieval.topk_retrieval``,
itself loop-oracle-tested in tests/test_ops.py. Key properties pinned
here: selection with a full-width margin is EXACTLY the fp32 result
(the re-score is exact, so quantization can only cost candidate
recall, never distance accuracy); default-margin recall on random
high-dim data; and the Pallas kernel (interpret mode) agreeing with
the XLA fallback bit-for-bit on indices.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from centroids_reid_tpu.ops.retrieval import topk_retrieval
from centroids_reid_tpu.ops.retrieval_int8 import (
    Int8Gallery,
    quantize_gallery,
    topk_retrieval_int8,
    topk_select_int8,
)


def _rand(seed, g=512, d=64, q=16):
    rng = np.random.RandomState(seed)
    return (rng.randn(q, d).astype(np.float32),
            rng.randn(g, d).astype(np.float32))


def test_quantize_roundtrip_bound():
    """Per-element dequantization error <= scale/2; gn is the dequantized
    norm (what selection actually ranks)."""
    _, gf = _rand(0)
    gal = quantize_gallery(gf)
    deq = np.asarray(gal.codes, np.float32) * np.asarray(gal.scale)[:, None]
    err = np.abs(deq - gf)
    assert (err <= np.asarray(gal.scale)[:, None] / 2 + 1e-7).all()
    np.testing.assert_allclose(
        np.asarray(gal.gn), np.sum(deq * deq, axis=1), rtol=1e-5
    )


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_full_margin_equals_exact_fp32(dist):
    """sel = G makes the exact re-score cover the whole gallery, so the
    int8 path must reproduce the fp32 oracle exactly (indices) with
    fp32-accurate distances — proving the re-score stage is exact and
    quantization only ever gates CANDIDATE recall."""
    qf, gf = _rand(1)
    gfr = gf
    if dist == "cosine":
        gfr = gf / np.linalg.norm(gf, axis=1, keepdims=True)
    gal = quantize_gallery(gfr)
    d_ref, i_ref = topk_retrieval(qf, gf, k=7, dist=dist, use_pallas=False)
    d_i8, i_i8 = topk_retrieval_int8(
        qf, gal, gfr, k=7, dist=dist, sel=gf.shape[0], use_pallas=False,
    )
    np.testing.assert_array_equal(i_i8, i_ref)
    np.testing.assert_allclose(d_i8, d_ref, rtol=1e-4, atol=1e-4)


def test_default_margin_recall_random():
    """Default margin (max(2k, k+16)) on random gaussian data: recall@k
    vs the exact fp32 oracle stays >= 0.99 — per-element quantization
    noise is <0.4% of the row max, far under typical inter-row gaps."""
    qf, gf = _rand(2, g=2048, d=256, q=32)
    k = 10
    gal = quantize_gallery(gf)
    _, i_ref = topk_retrieval(qf, gf, k=k, use_pallas=False)
    _, i_i8 = topk_retrieval_int8(qf, gal, gf, k=k, use_pallas=False)
    hits = sum(
        len(set(map(int, i_i8[r])) & set(map(int, i_ref[r])))
        for r in range(qf.shape[0])
    )
    recall = hits / (qf.shape[0] * k)
    assert recall >= 0.99, recall


def test_separated_clusters_semantics_and_margin():
    """Cluster-separated data: every returned neighbour must come from
    the query's own cluster at the default margin (inter-cluster gaps
    >> quantization noise). WITHIN a cluster the members are near-ties
    whose gaps sit below quantization noise, so strict top-k equality
    additionally needs the margin to cover the tie set — with
    ``sel >= cluster size`` the exact re-score sees every tied member
    and the result equals the fp32 oracle exactly."""
    # unit-scale features: raw scores stay O(100), so fp32 rounding in
    # two differently-ordered accumulations (full-matmul oracle vs the
    # candidate-set re-score) sits far below the intra-cluster gaps —
    # magnitude-8 features put scores near 4096 with gaps ~0.3, where the
    # cancellation noise alone reorders near-ties and no implementation
    # pair can agree bit-for-bit
    rng = np.random.RandomState(3)
    centers = rng.randn(16, 64).astype(np.float32)
    gf = np.concatenate([
        c + 0.2 * rng.randn(24, 64).astype(np.float32) for c in centers
    ])
    qf = centers + 0.2 * rng.randn(16, 64).astype(np.float32)
    gal = quantize_gallery(gf)
    d_ref, i_ref = topk_retrieval(qf, gf, k=5, use_pallas=False)

    _, i_def = topk_retrieval_int8(qf, gal, gf, k=5, use_pallas=False)
    assert (np.asarray(i_def) // 24 == np.arange(16)[:, None]).all()

    d_i8, i_i8 = topk_retrieval_int8(
        qf, gal, gf, k=5, sel=24, use_pallas=False,
    )
    np.testing.assert_array_equal(i_i8, i_ref)
    np.testing.assert_allclose(d_i8, d_ref, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_matches_xla_fallback():
    """The int8 score kernel (interpret mode on CPU) and the XLA fallback
    produce the same candidates and the same exact re-scored distances
    (Q % 128 == 0, G % 1024 == 0 — the kernel's shape contract)."""
    rng = np.random.RandomState(4)
    qf = rng.randn(128, 64).astype(np.float32)
    gf = rng.randn(2048, 64).astype(np.float32)
    gal = quantize_gallery(gf)
    d_x, i_x = topk_retrieval_int8(qf, gal, gf, k=9, use_pallas=False)
    d_p, i_p = topk_retrieval_int8(
        qf, gal, gf, k=9, use_pallas=True, interpret=True,
    )
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(d_p, d_x, rtol=1e-4, atol=1e-4)


def test_gallery_padding_never_selected():
    """A gallery that is not a _G_TILE multiple pads with +inf gn rows;
    none may surface even at k close to G."""
    rng = np.random.RandomState(5)
    qf = rng.randn(128, 32).astype(np.float32)
    gf = rng.randn(1500, 32).astype(np.float32)  # pads to 2048
    gal = quantize_gallery(gf)
    _, idx = topk_retrieval_int8(
        qf, gal, gf, k=50, use_pallas=True, interpret=True,
    )
    assert (np.asarray(idx) < 1500).all()


def test_select_core_returns_raw_scores():
    """topk_select_int8 returns RAW ||g||^2 - 2 q.g scores (the service
    contract shared with ops.retrieval.topk_select): adding ||q||^2
    reproduces squared-euclidean distances."""
    qf, gf = _rand(6, g=256, d=32, q=8)
    gal = quantize_gallery(gf)
    val, idx = topk_select_int8(
        jnp.asarray(qf), gal, jnp.asarray(gf), 4, use_pallas=False,
    )
    val = np.asarray(val) + np.sum(qf * qf, axis=1)[:, None]
    d_full = ((qf[:, None, :] - gf[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        val, np.take_along_axis(d_full, np.asarray(idx), axis=1),
        rtol=1e-3, atol=1e-3,
    )


def test_tiny_gallery_wide_k_with_padding():
    """g < default margin AND g far below the pad width: indices must be
    unique real rows (an unclamped margin would gather pad rows whose
    re-score take clamps to the last real row — duplicated indices)."""
    rng = np.random.RandomState(7)
    qf = rng.randn(128, 32).astype(np.float32)
    gf = rng.randn(60, 32).astype(np.float32)  # pads to 1024
    gal = quantize_gallery(gf)
    d_ref, i_ref = topk_retrieval(qf, gf, k=50, use_pallas=False)
    d, idx = topk_retrieval_int8(
        qf, gal, gf, k=50, use_pallas=True, interpret=True,
    )
    idx = np.asarray(idx)
    assert (idx < 60).all()
    assert all(len(set(map(int, row))) == 50 for row in idx)
    # margin 60 >= g: full coverage -> exact oracle equality
    np.testing.assert_array_equal(idx, i_ref)
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-4)


# ---- serving integration (RetrievalService(use_int8_gallery=True)) ----

@pytest.fixture(scope="module")
def svc_setup():
    """(cfg, model bundle, query imgs) for service-level int8 tests; the
    16-row galleries below keep the int8 margin >= G, so the exact
    re-score covers the whole gallery and results must EQUAL the exact
    fp32 service bit-for-bit on indices."""
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import create_train_state
    from centroids_reid_tpu.models import create_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TPU.NUM_GROUPS = 1
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    bundle = (model, state.params["model"], state.batch_stats)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (5, 32, 16, 3), np.uint8)
    return cfg, bundle, imgs


def test_service_int8_gallery_matches_exact_fp32(svc_setup):
    """use_int8_gallery=True vs the exact fp32 service on a gallery the
    margin fully covers: identical indices, fp32-close distances."""
    from centroids_reid_tpu.inference import RetrievalService

    cfg, bundle, imgs = svc_setup
    rng = np.random.RandomState(1)
    gal = rng.randn(16, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(16)])
    kw = dict(k=5, normalize=True, model_bundle=bundle)
    svc_ref = RetrievalService(cfg, gal, paths, use_bf16_kernel=False, **kw)
    svc_i8 = RetrievalService(
        cfg, gal, paths, use_bf16_kernel=False, use_int8_gallery=True, **kw,
    )
    assert svc_i8._int8_sel == 16  # margin covers the whole gallery
    d_r, i_r, p_r = svc_ref.query_arrays(imgs)
    d_q, i_q, p_q = svc_i8.query_arrays(imgs)
    np.testing.assert_array_equal(i_q, i_r)
    np.testing.assert_allclose(d_q, d_r, rtol=1e-4, atol=1e-4)
    assert (p_q == p_r).all()


def test_service_int8_gallery_rerank_matches_fp32_rerank(svc_setup):
    """int8 selection + windowed k-reciprocal re-rank == the fp32
    service's re-ranked output when the margin covers the gallery (the
    candidate WINDOW is then identical, and the re-rank math is shared
    via _rerank_tail)."""
    from centroids_reid_tpu.inference import RetrievalService

    cfg, bundle, imgs = svc_setup
    rng = np.random.RandomState(2)
    gal = rng.randn(16, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(16)])
    kw = dict(k=4, normalize=True, model_bundle=bundle,
              rerank_window=10, rerank_k1=6, rerank_k2=3,
              rerank_lambda=0.3)
    svc_ref = RetrievalService(cfg, gal, paths, use_bf16_kernel=False, **kw)
    svc_i8 = RetrievalService(
        cfg, gal, paths, use_bf16_kernel=False, use_int8_gallery=True, **kw,
    )
    d_r, i_r, _ = svc_ref.query_arrays(imgs)
    d_q, i_q, _ = svc_i8.query_arrays(imgs)
    np.testing.assert_array_equal(i_q, i_r)
    np.testing.assert_allclose(d_q, d_r, rtol=1e-4, atol=1e-4)


def test_service_int8_gallery_guards(svc_setup):
    """Composition guards: int8 gallery is single-chip (a mesh shards
    fp32/bf16 rows), and capacity mode (exact_rescore=False) cannot
    re-rank (the windowed core needs full-precision rows)."""
    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.parallel import make_retrieval_mesh

    cfg, bundle, _ = svc_setup
    gal = np.random.RandomState(3).randn(16, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(16)])
    with pytest.raises(ValueError, match="mesh"):
        RetrievalService(
            cfg, gal, paths, k=5, model_bundle=bundle,
            mesh=make_retrieval_mesh(), use_int8_gallery=True,
        )
    with pytest.raises(ValueError, match="re-rank"):
        RetrievalService(
            cfg, gal, paths, k=5, model_bundle=bundle,
            exact_rescore=False, use_int8_gallery=True, rerank_window=8,
        )


def test_capacity_mode_rescore_from_codes():
    """gf32=None (capacity mode): distances equal exact retrieval over
    the DEQUANTIZED gallery — the codes are the whole index."""
    qf, gf = _rand(8, g=512, d=64, q=16)
    gal = quantize_gallery(gf)
    deq = np.asarray(gal.codes, np.float32) * np.asarray(gal.scale)[:, None]
    d_ref, i_ref = topk_retrieval(qf, deq, k=7, use_pallas=False)
    d_cap, i_cap = topk_retrieval_int8(
        qf, gal, None, k=7, sel=gf.shape[0], use_pallas=False,
    )
    np.testing.assert_array_equal(i_cap, i_ref)
    np.testing.assert_allclose(d_cap, d_ref, rtol=1e-4, atol=1e-4)


def test_service_int8_capacity_mode(svc_setup):
    """Service capacity mode: no full-precision copy resident (0-row
    placeholder), and responses equal the ops-level capacity oracle on
    the service's own (normalized) embeddings."""
    import jax.numpy as _jnp

    from centroids_reid_tpu.data.transforms import normalize_batch
    from centroids_reid_tpu.inference import RetrievalService

    cfg, bundle, imgs = svc_setup
    rng = np.random.RandomState(9)
    gal = rng.randn(16, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(16)])
    svc_cap = RetrievalService(
        cfg, gal, paths, k=5, normalize=True, model_bundle=bundle,
        use_bf16_kernel=False, use_int8_gallery=True, exact_rescore=False,
    )
    assert svc_cap._gf32.shape[0] == 0  # nothing full-precision resident
    d_c, i_c, p_c = svc_cap.query_arrays(imgs)

    # oracle: embed by hand exactly like the service (normalize ->
    # embed -> L2), quantize the normalized gallery, capacity retrieval
    model, params, batch_stats = bundle
    x = normalize_batch(
        _jnp.asarray(imgs), tuple(cfg.INPUT.PIXEL_MEAN),
        tuple(cfg.INPUT.PIXEL_STD), dtype=_jnp.float32,
    )
    e = model.apply(
        {"params": params, "batch_stats": batch_stats}, x,
        method=model.embed,
    )
    e = np.asarray(e / _jnp.maximum(
        _jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
    ))
    g_n = gal / np.maximum(np.linalg.norm(gal, axis=1, keepdims=True),
                           1e-12)
    d_ref, i_ref = topk_retrieval_int8(
        e, quantize_gallery(g_n), None, k=5, sel=16, use_pallas=False,
    )
    np.testing.assert_array_equal(i_c, i_ref)
    np.testing.assert_allclose(d_c, d_ref, rtol=1e-4, atol=1e-4)
    assert (p_c == paths[np.asarray(i_ref)]).all()
