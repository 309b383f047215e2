"""Offline inference CLI flow tests: index build + retrieval + checkpoints."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import CheckpointManager, create_train_state
from centroids_reid_tpu.inference import build_embeddings, find_similar
from centroids_reid_tpu.models import create_model


def _cfg(tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.TPU.NUM_GROUPS = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.fixture()
def ckpt_dir(tmp_path):
    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    return mgr.latest_periodic()


@pytest.fixture()
def image_dirs(tmp_path):
    rng = np.random.RandomState(0)
    gallery = tmp_path / "gallery"
    query = tmp_path / "query"
    gallery.mkdir()
    query.mkdir()
    arrays = {}
    for pid in ("prodA", "prodB", "prodC"):
        for i in range(4):
            arr = rng.randint(0, 255, (32, 16, 3), np.uint8)
            name = f"{pid}_{i:02d}.jpg"
            Image.fromarray(arr).save(gallery / name)
            arrays[name] = arr
    # queries are byte-identical copies of three gallery images
    for name in ("prodA_01.jpg", "prodB_02.jpg", "prodC_00.jpg"):
        Image.fromarray(arrays[name]).save(query / f"q_{name}")
    return str(gallery), str(query)


def test_create_embeddings_flat(ckpt_dir, image_dirs, tmp_path):
    gallery, _ = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)
    assert emb.shape == (12, 512)
    assert len(paths) == 12
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "embeddings.npy"))
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "paths.npy"))


def test_create_embeddings_centroids_by_filename(ckpt_dir, image_dirs, tmp_path):
    gallery, _ = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    cfg.MODEL.USE_CENTROIDS = True
    emb, paths = build_embeddings(
        cfg, images_in_subfolders=False, pid_from="filename"
    )
    assert emb.shape == (3, 512)
    assert sorted(paths.tolist()) == ["prodA", "prodB", "prodC"]


def test_get_similar_self_retrieval(ckpt_dir, image_dirs, tmp_path):
    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    build_embeddings(cfg, images_in_subfolders=False)

    cfg2 = _cfg(tmp_path)
    cfg2.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg2.DATASETS.ROOT_DIR = query
    cfg2.OUTPUT_DIR = str(tmp_path / "out2")
    out = find_similar(
        cfg2, gallery_data=cfg.OUTPUT_DIR, images_in_subfolders=False,
        normalize_features=True, topk=3, use_pallas=False,
    )
    assert len(out) == 3
    for qpath, res in out.items():
        assert set(res) == {"indices", "paths", "distances"}
        expected = os.path.basename(qpath)[2:]  # strip "q_" prefix
        assert os.path.basename(res["paths"][0]) == expected
        assert res["distances"][0] == pytest.approx(0.0, abs=1e-3)
        assert (np.diff(res["distances"]) >= -1e-6).all()
    # saved artefacts with reference schema
    saved = np.load(
        os.path.join(cfg2.OUTPUT_DIR, "results.npy"), allow_pickle=True
    ).item()
    assert set(saved) == set(out)


def test_get_similar_reranked(ckpt_dir, image_dirs, tmp_path):
    """TPU.RERANK routes find_similar through ops/rerank.py (beyond-parity
    feature): reference output schema kept, a byte-identical query still
    retrieves itself first, distances sorted ascending."""
    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    build_embeddings(cfg, images_in_subfolders=False)

    cfg2 = _cfg(tmp_path)
    cfg2.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg2.DATASETS.ROOT_DIR = query
    cfg2.OUTPUT_DIR = str(tmp_path / "out_rr")
    cfg2.TPU.RERANK = True
    cfg2.TPU.RERANK_K1 = 5
    cfg2.TPU.RERANK_K2 = 2
    out = find_similar(
        cfg2, gallery_data=cfg.OUTPUT_DIR, images_in_subfolders=False,
        normalize_features=True, topk=5,
    )
    assert len(out) == 3
    for qpath, res in out.items():
        assert set(res) == {"indices", "paths", "distances"}
        assert len(res["indices"]) == 5
        expected = os.path.basename(qpath)[2:]  # strip "q_" prefix
        assert os.path.basename(res["paths"][0]) == expected
        assert (np.diff(res["distances"]) >= -1e-6).all()
    assert os.path.exists(os.path.join(cfg2.OUTPUT_DIR, "results.npy"))


def test_get_similar_windowed_rerank(ckpt_dir, image_dirs, tmp_path):
    """TPU.RERANK_WINDOW > 0 routes find_similar through the windowed
    re-ranker (ops/rerank.py::rerank_topk): same output schema, a
    byte-identical query still retrieves itself first."""
    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    build_embeddings(cfg, images_in_subfolders=False)

    cfg2 = _cfg(tmp_path)
    cfg2.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg2.DATASETS.ROOT_DIR = query
    cfg2.OUTPUT_DIR = str(tmp_path / "out_wrr")
    cfg2.TPU.RERANK = True
    cfg2.TPU.RERANK_WINDOW = 6
    cfg2.TPU.RERANK_K1 = 4
    cfg2.TPU.RERANK_K2 = 2
    out = find_similar(
        cfg2, gallery_data=cfg.OUTPUT_DIR, images_in_subfolders=False,
        normalize_features=True, topk=3,
    )
    assert len(out) == 3
    for qpath, res in out.items():
        assert set(res) == {"indices", "paths", "distances"}
        assert len(res["indices"]) == 3
        expected = os.path.basename(qpath)[2:]  # strip "q_" prefix
        assert os.path.basename(res["paths"][0]) == expected
        assert (np.diff(res["distances"]) >= -1e-6).all()
    assert os.path.exists(os.path.join(cfg2.OUTPUT_DIR, "results.npy"))


def test_get_similar_sharded_matches_single(ckpt_dir, image_dirs, tmp_path):
    """TPU.SHARDED_RETRIEVAL shards the get_similar ranking over the
    8-device mesh; results must match the single-device path."""
    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    build_embeddings(cfg, images_in_subfolders=False)

    outs = []
    for sharded in (False, True):
        c = _cfg(tmp_path)
        c.MODEL.PRETRAIN_PATH = ckpt_dir
        c.DATASETS.ROOT_DIR = query
        c.OUTPUT_DIR = str(tmp_path / f"out_sh{int(sharded)}")
        c.TPU.SHARDED_RETRIEVAL = sharded
        outs.append(find_similar(
            c, gallery_data=cfg.OUTPUT_DIR, images_in_subfolders=False,
            normalize_features=True, topk=3, use_pallas=False,
        ))
    ref, sh = outs
    assert set(ref) == set(sh)
    for qp in ref:
        assert np.array_equal(ref[qp]["indices"], sh[qp]["indices"])
        np.testing.assert_allclose(
            ref[qp]["distances"], sh[qp]["distances"], rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("backbone", ["resnet18", "resnet50_ibn_a"])
def test_load_reference_torch_checkpoint(image_dirs, tmp_path, backbone):
    """A Lightning-style torch checkpoint round-trips through the converter
    and produces identical embeddings to the native params. The IBN-a case
    covers the fashion flagship's IN/BN split naming
    (layerX.Y.bn1.{IN,BN}.* <-> the flax IBN module tree)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    cfg = _cfg(tmp_path)
    cfg.MODEL.NAME = backbone
    cfg.MODEL.BACKBONE_EMB_SIZE = 512 if backbone == "resnet18" else 2048
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=1)
    params_model = jax.tree.map(np.asarray, state.params["model"])
    batch_stats = jax.tree.map(np.asarray, state.batch_stats)

    # Build the torch state_dict with reference naming (bases.py:70-87).
    sd = {}

    def walk(prefix, p_node, s_node):
        for k, v in p_node.items():
            name = k.replace("layer", "layer").replace("_", ".", 1) if k.startswith("layer") else k
            if isinstance(v, dict):
                sub_s = s_node.get(k, {}) if isinstance(s_node, dict) else {}
                if k == "downsample_conv":
                    walk(prefix + "downsample.0.", v, sub_s)
                elif k == "downsample_bn":
                    walk(prefix + "downsample.1.", v, sub_s)
                else:
                    walk(prefix + name + ".", v, sub_s)
            else:
                if k == "kernel":
                    if v.ndim == 4:
                        sd[prefix + "weight"] = torch.from_numpy(
                            v.transpose(3, 2, 0, 1).copy()
                        )
                    else:
                        sd[prefix + "weight"] = torch.from_numpy(v.T.copy())
                elif k == "scale":
                    sd[prefix + "weight"] = torch.from_numpy(v.copy())
                else:
                    sd[prefix + "bias"] = torch.from_numpy(v.copy())

    walk("backbone.base.", params_model["backbone"], batch_stats["backbone"])

    def put_stats(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                name = k
                if k == "downsample_bn":
                    name = "downsample.1"
                elif k.startswith("layer"):
                    name = k.replace("_", ".", 1)
                put_stats(prefix + name + ".", v)
            elif k == "mean":
                sd[prefix + "running_mean"] = torch.from_numpy(v.copy())
            elif k == "var":
                sd[prefix + "running_var"] = torch.from_numpy(v.copy())

    put_stats("backbone.base.", batch_stats["backbone"])
    sd["bn.weight"] = torch.from_numpy(params_model["bnneck"]["scale"].copy())
    sd["bn.bias"] = torch.from_numpy(params_model["bnneck"]["bias"].copy())
    sd["bn.running_mean"] = torch.from_numpy(batch_stats["bnneck"]["mean"].copy())
    sd["bn.running_var"] = torch.from_numpy(batch_stats["bnneck"]["var"].copy())
    sd["fc_query.weight"] = torch.from_numpy(
        params_model["fc_query"]["kernel"].T.copy()
    )

    ckpt_path = str(tmp_path / "reference.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    from centroids_reid_tpu.inference import load_inference_model

    cfg.MODEL.PRETRAIN_PATH = ckpt_path
    model2, params2, stats2 = load_inference_model(cfg)

    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 16, 3), jnp.float32)
    e1 = model.apply(
        {"params": params_model, "batch_stats": batch_stats}, x,
        method=model.embed,
    )
    e2 = model2.apply(
        {"params": params2, "batch_stats": stats2}, x, method=model2.embed
    )
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_retrieval_service_self_query(ckpt_dir, image_dirs, tmp_path):
    """One-dispatch serving path: identical query image ranks first."""
    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    from centroids_reid_tpu.inference import RetrievalService

    svc = RetrievalService(
        cfg, emb, paths, k=3, normalize=True, use_bf16_kernel=False,
    )
    qfiles = sorted(
        os.path.join(query, f) for f in os.listdir(query)
    )
    d, idx, res_paths = svc.query_files(qfiles)
    assert d.shape == (3, 3)
    for qi, qpath in enumerate(qfiles):
        expected = os.path.basename(qpath)[2:]  # strip "q_"
        assert os.path.basename(res_paths[qi, 0]) == expected
        assert d[qi, 0] == pytest.approx(0.0, abs=1e-3)
        assert (np.diff(d[qi]) >= -1e-6).all()


def test_retrieval_service_clamps_query_batch(ckpt_dir, image_dirs,
                                              tmp_path, monkeypatch):
    """At k > 32 the selection materialises a [B, Gp] fp32 score matrix per
    dispatch; the service must clamp max_query_batch against the score
    budget (huge galleries shrink the dispatch instead of OOMing) and the
    host-side chunking must keep results identical."""
    import centroids_reid_tpu.inference.service as S

    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    from centroids_reid_tpu.inference import RetrievalService

    # gallery pads to _G_TILE=1024 rows -> 4 KB of scores per query row;
    # a 256-row budget must clamp the default 512 down to 256
    monkeypatch.setattr(S, "_SCORE_BUDGET_BYTES", 256 * 1024 * 4)
    svc = RetrievalService(
        cfg, emb, paths, k=40, normalize=True, use_bf16_kernel=False,
    )
    assert svc.max_query_batch == 256
    # floor: even a budget smaller than one Pallas query tile yields 128
    monkeypatch.setattr(S, "_SCORE_BUDGET_BYTES", 1024)
    svc_floor = RetrievalService(
        cfg, emb, paths, k=40, normalize=True, use_bf16_kernel=False,
    )
    assert svc_floor.max_query_batch == 128
    # the streaming-merge path (bf16, k <= 32) never materialises scores
    # and must keep the caller's batch
    svc_small_k = RetrievalService(
        cfg, emb, paths, k=3, normalize=True, use_bf16_kernel=True,
    )
    assert svc_small_k.max_query_batch == 512

    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    d, idx, res_paths = svc_floor.query_files(qfiles)
    assert d.shape == (3, 12)  # k=40 capped to gallery size
    for qi, qpath in enumerate(qfiles):
        expected = os.path.basename(qpath)[2:]
        assert os.path.basename(res_paths[qi, 0]) == expected


def test_create_embeddings_int8(ckpt_dir, image_dirs, tmp_path):
    """TPU.INT8_EVAL routes build_embeddings through the quantized serving
    path (self-calibrated on the input folder) and stays close to fp32."""
    gallery, _ = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb_fp, _ = build_embeddings(cfg, images_in_subfolders=False)

    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CALIB_BATCHES = 1
    emb_q, paths = build_embeddings(cfg, images_in_subfolders=False)
    assert emb_q.shape == (12, 512)
    cos = np.sum(emb_fp * emb_q, 1) / (
        np.linalg.norm(emb_fp, axis=1) * np.linalg.norm(emb_q, axis=1)
    )
    assert cos.min() > 0.98, cos


def test_retrieval_service_int8(ckpt_dir, image_dirs, tmp_path):
    """int8 embed stage inside the one-dispatch serving program: identical
    query images must still rank themselves first."""
    from PIL import Image as _Image

    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    from centroids_reid_tpu.inference import RetrievalService

    calib = np.stack([
        np.asarray(_Image.open(os.path.join(gallery, f)).resize((16, 32)))
        for f in sorted(os.listdir(gallery))[:4]
    ])
    svc = RetrievalService(
        cfg, emb, paths, k=3, normalize=True, use_bf16_kernel=False,
        int8_calib_imgs=calib,
    )
    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    d, idx, res_paths = svc.query_files(qfiles)
    for qi, qpath in enumerate(qfiles):
        expected = os.path.basename(qpath)[2:]
        assert os.path.basename(res_paths[qi, 0]) == expected


def test_retrieval_service_int8_sharded_gallery(ckpt_dir, image_dirs,
                                                tmp_path):
    """int8 embed composes with the mesh-sharded gallery: the replicated
    quantized embed feeds the per-shard ranking, results match the
    single-chip int8 service exactly."""
    from PIL import Image as _Image

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.parallel.mesh import make_retrieval_mesh

    gallery, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    cfg.DATASETS.ROOT_DIR = gallery
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    calib = np.stack([
        np.asarray(_Image.open(os.path.join(gallery, f)).resize((16, 32)))
        for f in sorted(os.listdir(gallery))[:4]
    ])
    kw = dict(k=3, normalize=True, use_bf16_kernel=False,
              int8_calib_imgs=calib)
    single = RetrievalService(cfg, emb, paths, **kw)
    sharded = RetrievalService(
        cfg, emb, paths, mesh=make_retrieval_mesh(8), **kw
    )
    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    d1, i1, p1 = single.query_files(qfiles)
    d2, i2, p2 = sharded.query_files(qfiles)
    assert np.array_equal(i1, i2) and np.array_equal(p1, p2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)
    assert os.path.basename(p2[0, 0]).endswith(
        os.path.basename(qfiles[0])[2:]
    )


def test_int8_cache_path_roundtrip(ckpt_dir, image_dirs, tmp_path):
    """TPU.INT8_CACHE_PATH: first run calibrates and saves, second run
    loads the artifact (no recalibration) and produces identical output."""
    gallery, _ = image_dirs
    cache = str(tmp_path / "quant.npz")

    def run(outdir):
        cfg = _cfg(tmp_path)
        cfg.MODEL.PRETRAIN_PATH = ckpt_dir
        cfg.DATASETS.ROOT_DIR = gallery
        cfg.TPU.INT8_EVAL = True
        cfg.TPU.INT8_CALIB_BATCHES = 1
        cfg.TPU.INT8_CACHE_PATH = cache
        cfg.OUTPUT_DIR = str(tmp_path / outdir)
        return build_embeddings(cfg, images_in_subfolders=False)[0]

    emb1 = run("o1")
    assert os.path.exists(cache)
    emb2 = run("o2")
    np.testing.assert_array_equal(emb1, emb2)


def test_int8_cache_validation_and_bare_path(ckpt_dir, image_dirs, tmp_path):
    """Bare cache paths get the .npz suffix consistently, and a cached
    artifact built under a different config is rejected (recalibrated),
    not silently served."""
    gallery, _ = image_dirs
    cache = str(tmp_path / "qcache")  # no extension on purpose

    def run(outdir, size):
        cfg = _cfg(tmp_path)
        cfg.MODEL.PRETRAIN_PATH = ckpt_dir
        cfg.DATASETS.ROOT_DIR = gallery
        cfg.INPUT.SIZE_TEST = list(size)
        cfg.TPU.INT8_EVAL = True
        cfg.TPU.INT8_CALIB_BATCHES = 1
        cfg.TPU.INT8_CACHE_PATH = cache
        cfg.OUTPUT_DIR = str(tmp_path / outdir)
        return build_embeddings(cfg, images_in_subfolders=False)[0]

    run("c1", (32, 16))
    assert os.path.exists(cache + ".npz")
    first_mtime = os.path.getmtime(cache + ".npz")
    # identity mismatch (different input size) must recalibrate+overwrite
    run("c2", (64, 32))
    assert os.path.getmtime(cache + ".npz") > first_mtime
    # matching rerun loads without rewriting
    second_mtime = os.path.getmtime(cache + ".npz")
    run("c3", (64, 32))
    assert os.path.getmtime(cache + ".npz") == second_mtime


def test_retrieval_service_k100_matches_topk_retrieval(
    ckpt_dir, image_dirs, tmp_path
):
    """The serving program and the CLI kernel must agree at the reference's
    canonical retrieval depth (k=100, get_similar.py:57) — round 2 routed
    the service's k>32 queries through a different (chunked XLA) path; both
    now share ops.retrieval.topk_select."""
    import jax.numpy as jnp

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.api import load_inference_model
    from centroids_reid_tpu.inference.utils import run_inference
    from centroids_reid_tpu.ops import topk_retrieval

    _, query = image_dirs
    cfg = _cfg(tmp_path)
    cfg.MODEL.PRETRAIN_PATH = ckpt_dir
    # synthetic 600-entry gallery: big enough that k=100 < G
    rng = np.random.RandomState(7)
    emb = rng.randn(600, 512).astype(np.float32)
    paths = np.array([f"g{i:04d}.jpg" for i in range(600)])

    svc = RetrievalService(
        cfg, emb, paths, k=100, normalize=True, use_bf16_kernel=False,
    )
    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    d_svc, idx_svc, _ = svc.query_files(qfiles)

    # independent path: embed the queries, normalise both sides, rank with
    # the CLI kernel
    model, params, stats = load_inference_model(cfg)
    qe, _ = run_inference(model, cfg, params, stats, qfiles)
    qe = qe / np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
    ge = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    d_ref, idx_ref = topk_retrieval(qe, ge, 100, use_pallas=False)

    np.testing.assert_array_equal(idx_svc, idx_ref)
    np.testing.assert_allclose(d_svc, d_ref, rtol=1e-4, atol=1e-4)
