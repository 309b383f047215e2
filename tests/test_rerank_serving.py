"""Windowed k-reciprocal re-ranking in the SERVING path (round 5).

The offline wiring (``get_similar --rerank`` windowed path,
inference/api.py) gained serving mirrors: ``RetrievalService(
rerank_window=r)``, the gallery-sharded service (cross-shard candidate
row gather, parallel/retrieval.py::make_sharded_row_gather), and
``LoadedRetriever(rerank_window=r)`` for artifact serving. These tests
pin all three against ``ops.rerank.rerank_topk`` — the implementation
the CLI path dispatches and the loop oracle tests (tests/test_rerank.py)
— on the same inputs. The reference repo has no re-ranking and no
serving; the surface being mirrored is its offline retrieval CLI
(/root/reference/inference/get_similar.py:112-119).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.data.transforms import normalize_batch
from centroids_reid_tpu.engine import create_train_state
from centroids_reid_tpu.inference import RetrievalService
from centroids_reid_tpu.models import create_model
from centroids_reid_tpu.ops.rerank import rerank_topk

K, R = 5, 24
RERANK_KW = dict(rerank_window=R, rerank_k1=8, rerank_k2=3,
                 rerank_lambda=0.3)


def _cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TPU.NUM_GROUPS = 1
    return cfg


@pytest.fixture(scope="module")
def setup():
    """(cfg, model bundle, gallery [G, 512], paths, query imgs, expected
    (dists, idx) [Q, K] from the CLI-path implementation rerank_topk,
    (normalized query embeddings, normalized gallery) for re-deriving
    expectations under other local distances)."""
    cfg = _cfg()
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    bundle = (model, state.params["model"], state.batch_stats)

    rng = np.random.RandomState(0)
    gal = rng.randn(67, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(len(gal))])
    imgs = rng.randint(0, 256, (6, 32, 16, 3), np.uint8)

    # the service's embed stage, replicated by hand (service.py::embed_q
    # RGB branch): normalize -> backbone+BNNeck -> L2
    x = normalize_batch(
        jnp.asarray(imgs), tuple(cfg.INPUT.PIXEL_MEAN),
        tuple(cfg.INPUT.PIXEL_STD), dtype=jnp.float32,
    )
    e = model.apply(
        {"params": bundle[1], "batch_stats": bundle[2]}, x,
        method=model.embed,
    )
    e = np.asarray(e / jnp.maximum(
        jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
    ))
    gal_n = gal / np.maximum(np.linalg.norm(gal, axis=1, keepdims=True),
                             1e-12)
    d_ref, i_ref = rerank_topk(
        e, gal_n, r=R, k1=RERANK_KW["rerank_k1"],
        k2=RERANK_KW["rerank_k2"],
        lambda_value=RERANK_KW["rerank_lambda"], use_pallas=False,
    )
    expected = (np.asarray(d_ref)[:, :K], np.asarray(i_ref)[:, :K])
    return cfg, bundle, gal, paths, imgs, expected, (e, gal_n)


def test_service_rerank_matches_cli_rerank_topk(setup):
    """One-dispatch service responses == the get_similar --rerank
    windowed path (rerank_topk) on the same embeddings/gallery."""
    cfg, bundle, gal, paths, imgs, (d_ref, i_ref), _ = setup
    svc = RetrievalService(
        cfg, gal, paths, k=K, normalize=True, use_bf16_kernel=False,
        model_bundle=bundle, **RERANK_KW,
    )
    assert svc.rerank_window == R
    d, idx, p = svc.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)
    assert (p == paths[i_ref]).all()


def test_rerank_window_clamps_to_gallery_and_k(setup):
    cfg, bundle, gal, paths, _, _, _ = setup
    svc = RetrievalService(
        cfg, gal[:10], paths[:10], k=8, normalize=True,
        use_bf16_kernel=False, model_bundle=bundle,
        rerank_window=3,  # below k -> raised to k; above G -> clamped
    )
    assert svc.rerank_window == 8
    svc2 = RetrievalService(
        cfg, gal[:10], paths[:10], k=8, normalize=True,
        use_bf16_kernel=False, model_bundle=bundle, rerank_window=500,
    )
    assert svc2.rerank_window == 10


def test_sharded_service_rerank_matches_single_chip(setup):
    """Gallery sharded over the 8-device mesh: candidate rows arrive via
    the cross-shard psum gather; results must equal the single-chip
    re-ranked service (fp32 kernels are bit-identical)."""
    from centroids_reid_tpu.parallel import make_retrieval_mesh

    cfg, bundle, gal, paths, imgs, (d_ref, i_ref), _ = setup
    mesh = make_retrieval_mesh()
    svc = RetrievalService(
        cfg, gal, paths, k=K, normalize=True, use_bf16_kernel=False,
        model_bundle=bundle, mesh=mesh, **RERANK_KW,
    )
    d, idx, _ = svc.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)


def test_loaded_retriever_rerank_matches_service(tmp_path, setup):
    """Artifact serving with --rerank_window: LoadedRetriever ranks
    through the same reranked_query program as the live service."""
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
        save_artifact,
    )

    cfg, bundle, gal, paths, imgs, (d_ref, i_ref), _ = setup
    model, params, batch_stats = bundle
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, gal, paths, k=K,
        batch_size=6, platforms=("cpu",),
    )
    path = str(tmp_path / "retr.crtpu")
    save_artifact(path, blob, meta, aux=aux)
    loaded = load_retriever(path, use_pallas=False, **RERANK_KW)
    assert loaded.rerank_window == R
    d, idx, p = loaded.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)
    assert (p == paths[i_ref]).all()


def test_make_sharded_row_gather_matches_take(setup):
    """The psum row gather == a plain host-side take, any index layout
    (in-shard, cross-shard, repeated)."""
    from centroids_reid_tpu.parallel import make_retrieval_mesh
    from centroids_reid_tpu.parallel.retrieval import (
        make_sharded_row_gather,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P
    from centroids_reid_tpu.parallel.mesh import GALLERY_AXIS

    mesh = make_retrieval_mesh()
    n = mesh.shape[GALLERY_AXIS]
    rng = np.random.RandomState(1)
    g = 5 * n
    gf = rng.randn(g, 16).astype(np.float32)
    idx = rng.randint(0, g, (7, 9)).astype(np.int32)
    gf_d = jax.device_put(
        jnp.asarray(gf), NamedSharding(mesh, P(GALLERY_AXIS))
    )
    gather = jax.jit(make_sharded_row_gather(mesh, g // n))
    out = np.asarray(gather(jnp.asarray(idx), gf_d))
    np.testing.assert_allclose(out, gf[idx], atol=1e-6)


def _cosine_expected(e, gal_n):
    """The CLI windowed path under SOLVER.DISTANCE_FUNC='cosine'
    (inference/api.py passes the config's distance into rerank_topk)."""
    d_ref, i_ref = rerank_topk(
        e, gal_n, r=R, k1=RERANK_KW["rerank_k1"],
        k2=RERANK_KW["rerank_k2"],
        lambda_value=RERANK_KW["rerank_lambda"], dist="cosine",
        use_pallas=False,
    )
    return np.asarray(d_ref)[:, :K], np.asarray(i_ref)[:, :K]


def test_service_rerank_cosine_matches_cli(setup):
    """SOLVER.DISTANCE_FUNC='cosine' threads into the serving re-rank's
    LOCAL distances: served responses == the CLI windowed path
    (rerank_topk(dist='cosine')) on the same embeddings/gallery. The
    service's candidate selection stays euclidean, which is
    rank-equivalent on the normalized features it enforces for this
    config (||a-b||^2 = 2(1-cos))."""
    _, bundle, gal, paths, imgs, _, (e, gal_n) = setup
    cfg = _cfg()
    cfg.SOLVER.DISTANCE_FUNC = "cosine"
    d_ref, i_ref = _cosine_expected(e, gal_n)
    svc = RetrievalService(
        cfg, gal, paths, k=K, normalize=True, use_bf16_kernel=False,
        model_bundle=bundle, **RERANK_KW,
    )
    d, idx, _ = svc.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)


def test_service_rerank_cosine_requires_normalize(setup):
    """Unnormalized serving + cosine re-rank cannot equal the CLI path
    (euclidean candidate selection is not rank-equivalent there), so the
    service refuses the combination at construction."""
    _, bundle, gal, paths, _, _, _ = setup
    cfg = _cfg()
    cfg.SOLVER.DISTANCE_FUNC = "cosine"
    with pytest.raises(ValueError, match="rank-equivalent"):
        RetrievalService(
            cfg, gal, paths, k=K, normalize=False, use_bf16_kernel=False,
            model_bundle=bundle, **RERANK_KW,
        )


def test_loaded_retriever_rerank_cosine_matches_cli(tmp_path, setup):
    """The export-time SOLVER.DISTANCE_FUNC rides in the artifact meta
    ('distance') and drives a --rerank_window load's local distances —
    artifact serving == the CLI windowed cosine path."""
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
        save_artifact,
    )

    _, bundle, gal, paths, imgs, _, (e, gal_n) = setup
    cfg = _cfg()
    cfg.SOLVER.DISTANCE_FUNC = "cosine"
    model, params, batch_stats = bundle
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, gal, paths, k=K,
        batch_size=6, platforms=("cpu",),
    )
    assert meta["distance"] == "cosine"
    path = str(tmp_path / "retr_cos.crtpu")
    save_artifact(path, blob, meta, aux=aux)
    loaded = load_retriever(path, use_pallas=False, **RERANK_KW)
    d_ref, i_ref = _cosine_expected(e, gal_n)
    d, idx, p = loaded.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)
    assert (p == paths[i_ref]).all()


def test_loaded_retriever_rerank_cosine_unnormalized_raises(tmp_path, setup):
    """A cosine-config artifact exported with normalize=False cannot be
    served with --rerank_window (selection not rank-equivalent): the
    load fails loudly instead of serving silently-divergent results."""
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
        save_artifact,
    )

    _, bundle, gal, paths, _, _, _ = setup
    cfg = _cfg()
    cfg.SOLVER.DISTANCE_FUNC = "cosine"
    model, params, batch_stats = bundle
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, gal, paths, k=K,
        batch_size=6, normalize=False, platforms=("cpu",),
    )
    path = str(tmp_path / "retr_cos_unnorm.crtpu")
    save_artifact(path, blob, meta, aux=aux)
    with pytest.raises(ValueError, match="rank-equivalent"):
        load_retriever(path, use_pallas=False, **RERANK_KW)
    # without re-ranking the artifact stays servable
    load_retriever(path, use_pallas=False)


def test_sharded_service_rerank_cosine_matches_cli(setup):
    """The gallery-sharded re-rank program (_windowed_feats over psum-
    gathered candidate rows) threads the config distance too — sharded
    cosine serving == the CLI windowed cosine path."""
    from centroids_reid_tpu.parallel import make_retrieval_mesh

    _, bundle, gal, paths, imgs, _, (e, gal_n) = setup
    cfg = _cfg()
    cfg.SOLVER.DISTANCE_FUNC = "cosine"
    d_ref, i_ref = _cosine_expected(e, gal_n)
    svc = RetrievalService(
        cfg, gal, paths, k=K, normalize=True, use_bf16_kernel=False,
        model_bundle=bundle, mesh=make_retrieval_mesh(), **RERANK_KW,
    )
    d, idx, _ = svc.query_arrays(imgs)
    assert (idx == i_ref).all()
    np.testing.assert_allclose(d, d_ref, atol=1e-5)
