"""Serving-artifact export (inference/export.py): jax.export roundtrips.

The exported program must be byte-identical in semantics to the
RetrievalService embed stage (service.py::embed_q, RGB branch): uint8 in,
device-side normalize, backbone+BNNeck embed, L2-normalize epilogue.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.data.transforms import normalize_batch
from centroids_reid_tpu.inference.export import (
    FORMAT_VERSION,
    export_embedder,
    export_from_config,
    load_embedder,
    read_artifact,
    save_artifact,
)
from centroids_reid_tpu.models import create_model, init_model


def _cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.BACKBONE_EMB_SIZE = 512
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    return cfg


def _tiny_model(cfg, seed=0):
    model = create_model(cfg, num_classes=0)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(seed), tuple(cfg.INPUT.SIZE_TEST)
    )
    return model, params, batch_stats


def _direct_embed(model, cfg, params, batch_stats, imgs_u8):
    x = normalize_batch(
        jnp.asarray(imgs_u8), tuple(cfg.INPUT.PIXEL_MEAN),
        tuple(cfg.INPUT.PIXEL_STD), dtype=jnp.float32,
    )
    e = model.apply(
        {"params": params, "batch_stats": batch_stats}, x,
        method=model.embed,
    )
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    return np.asarray(e)


def test_export_roundtrip_symbolic_batch(tmp_path):
    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    blob, meta = export_embedder(
        model, cfg, params, batch_stats, platforms=("cpu",)
    )
    assert meta["batch_size"] is None and meta["emb_dim"] == 512
    path = str(tmp_path / "model.crtpu")
    save_artifact(path, blob, meta)

    emb = load_embedder(path)
    assert emb.meta["model_name"] == "resnet18"
    rng = np.random.RandomState(0)
    for n in (3, 7):  # two batch sizes through ONE symbolic program
        imgs = rng.randint(0, 256, (n, 32, 16, 3), np.uint8)
        got = emb.embed(imgs)
        want = _direct_embed(model, cfg, params, batch_stats, imgs)
        assert got.shape == (n, 512)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_fixed_batch_pads_partial(tmp_path):
    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    blob, meta = export_embedder(
        model, cfg, params, batch_stats, platforms=("cpu",), batch_size=4
    )
    path = str(tmp_path / "model.crtpu")
    save_artifact(path, blob, meta)
    emb = load_embedder(path)

    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (6, 32, 16, 3), np.uint8)  # 4 + partial 2
    got = emb.embed(imgs)
    want = _direct_embed(model, cfg, params, batch_stats, imgs)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # zero-row output contract
    assert emb.embed(imgs[:0]).shape == (0, 512)


def test_artifact_validation(tmp_path):
    bad = tmp_path / "bad.crtpu"
    bad.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="bad magic"):
        read_artifact(str(bad))

    # a wrong format version must refuse loudly
    from centroids_reid_tpu.inference import export as ex

    path = str(tmp_path / "v999.crtpu")
    save_artifact(path, b"blob", {"format_version": 999, "kind": "embedder"})
    with pytest.raises(ValueError, match="format v999"):
        read_artifact(path)

    path2 = str(tmp_path / "kind.crtpu")
    save_artifact(
        path2, b"blob", {"format_version": FORMAT_VERSION, "kind": "other"}
    )
    with pytest.raises(ValueError, match="kind"):
        ex.load_embedder(path2)


def test_export_int8_program(tmp_path):
    """The quantized pipeline exports with the qtree baked in as constants
    and reproduces QuantizedEmbed's outputs exactly."""
    from centroids_reid_tpu.models.quantized import quantize_reid_model

    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    rng = np.random.RandomState(2)
    calib = rng.randint(0, 256, (8, 32, 16, 3), np.uint8)
    qfn = quantize_reid_model(
        model, params, batch_stats, [calib],
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
    )

    with pytest.raises(ValueError, match="batch_size"):
        export_embedder(
            model, cfg, params, batch_stats, platforms=("cpu",),
            int8_qfn=qfn,
        )

    blob, meta = export_embedder(
        model, cfg, params, batch_stats, platforms=("cpu",),
        batch_size=4, int8_qfn=qfn,
    )
    assert meta["quantized"] is True
    path = str(tmp_path / "int8.crtpu")
    save_artifact(path, blob, meta)
    emb = load_embedder(path)

    imgs = rng.randint(0, 256, (4, 32, 16, 3), np.uint8)
    raw = np.asarray(qfn(imgs))
    want = raw / np.maximum(
        np.linalg.norm(raw, axis=1, keepdims=True), 1e-12
    )
    got = emb.embed(imgs)
    assert got.shape == want.shape
    # Not bit-exact by design: the exported program bakes the qtree as
    # constants and fuses the normalize epilogue, so XLA compiles a
    # different program than qfn's jit — float-association changes flip
    # int8 rounding buckets at quantization boundaries (jit-vs-eager on
    # the SAME qfn already differs ~0.1 maxabs on CPU). The geometry
    # contract is the one the int8 subsystem guarantees everywhere:
    # cosine > 0.99 (test_quantized.py::test_int8_embedding_cosine).
    cos = np.sum(got * want, axis=1)
    assert cos.min() > 0.99, cos


def test_export_from_config_end_to_end(tmp_path):
    """checkpoint -> artifact -> load -> embed, via the CLI flow."""
    from centroids_reid_tpu.engine import CheckpointManager, create_train_state

    cfg = _cfg()
    cfg.TPU.NUM_GROUPS = 1
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()

    out = str(tmp_path / "model.crtpu")
    meta = export_from_config(cfg, out, platforms=("cpu",))
    assert meta["kind"] == "embedder" and meta["quantized"] is False

    emb = load_embedder(out)
    imgs = np.random.RandomState(3).randint(0, 256, (2, 32, 16, 3), np.uint8)
    e = emb.embed(imgs)
    assert e.shape == (2, 512)
    n = np.linalg.norm(e.astype(np.float32), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_export_from_config_requires_int8_cache(tmp_path):
    cfg = _cfg()
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CACHE_PATH = str(tmp_path / "missing")
    cfg.MODEL.PRETRAIN_PATH = "unused"
    with pytest.raises(ValueError, match="calibrated artifact"):
        export_from_config(cfg, str(tmp_path / "out.crtpu"))


# --- artifact v2: the full embed+rank serving pipeline ----------------------

def _gallery_service(cfg, model, params, batch_stats, g=40, k=5, seed=4):
    from centroids_reid_tpu.inference import RetrievalService

    rng = np.random.RandomState(seed)
    emb = rng.randn(g, 512).astype(np.float32)
    paths = np.array([f"item_{i:03d}" for i in range(g)])
    svc = RetrievalService(
        cfg, emb, paths, k=k, normalize=True, use_bf16_kernel=False,
        model_bundle=(model, params, batch_stats),
    )
    return svc, emb, paths


def test_retriever_roundtrip_matches_service(tmp_path):
    """Artifact v2 = RetrievalService's one-dispatch embed+rank program:
    loading it back must reproduce the live service's rankings and
    distances on identical query images, with the gallery attached from
    the artifact's aux section (no index directory at load)."""
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
    )

    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    svc, emb, paths = _gallery_service(cfg, model, params, batch_stats)

    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, emb, paths, k=5, batch_size=4,
        platforms=("cpu",),
    )
    assert meta["kind"] == "retriever" and meta["k"] == 5
    assert meta["gallery_size"] == 40 and meta["ingest"] == "rgb"
    path = str(tmp_path / "retriever.crtpu")
    save_artifact(path, blob, meta, aux=aux)

    ret = load_retriever(path)
    assert ret.k == 5 and ret.model_name == "resnet18"
    assert list(ret.paths) == list(paths)

    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (6, 32, 16, 3), np.uint8)  # 4 + partial 2
    d_s, i_s, p_s = svc.query_arrays(imgs)
    d_a, i_a, p_a = ret.query_arrays(imgs)
    np.testing.assert_array_equal(i_a, i_s)
    np.testing.assert_array_equal(p_a, p_s)
    np.testing.assert_allclose(d_a, d_s, atol=1e-5)

    # warmup contract: one fixed program shape, nothing recompiles after
    n0 = ret.num_compiles
    ret.warmup()
    assert ret.num_compiles == n0  # roundtrip above already compiled it
    ret.query_arrays(imgs[:4])
    assert ret.num_compiles == n0


def test_loaded_embedder_warmup_no_recompile(tmp_path):
    """warmup() pre-compiles the serving shapes so the first request does
    not pay the XLA compile; subsequent same-shape calls never recompile."""
    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    blob, meta = export_embedder(
        model, cfg, params, batch_stats, platforms=("cpu",)
    )
    path = str(tmp_path / "model.crtpu")
    save_artifact(path, blob, meta)
    emb = load_embedder(path)

    with pytest.raises(ValueError, match="batch_sizes"):
        emb.warmup()  # symbolic artifact needs explicit sizes
    emb.warmup(batch_sizes=[2, 5])
    n0 = emb.num_compiles
    assert n0 >= 1
    rng = np.random.RandomState(6)
    emb.embed(rng.randint(0, 256, (2, 32, 16, 3), np.uint8))
    emb.embed(rng.randint(0, 256, (5, 32, 16, 3), np.uint8))
    assert emb.num_compiles == n0  # served shapes were pre-compiled

    # fixed-batch artifact: warmup() needs no sizes (one program shape)
    blob, meta = export_embedder(
        model, cfg, params, batch_stats, platforms=("cpu",), batch_size=4
    )
    path2 = str(tmp_path / "fixed.crtpu")
    save_artifact(path2, blob, meta)
    emb2 = load_embedder(path2)
    emb2.warmup()
    n0 = emb2.num_compiles
    emb2.embed(rng.randint(0, 256, (7, 32, 16, 3), np.uint8))  # pads to 4s
    assert emb2.num_compiles == n0


def test_retriever_artifact_serves_without_checkpoint(tmp_path):
    """The deployment done-criterion: build the artifact, DELETE the
    checkpoint and the index directory, and serve /search from the
    artifact alone in a fresh subprocess — responses must equal the
    library path's answers."""
    import base64
    import json as json_mod
    import os
    import shutil
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    from PIL import Image

    from conftest import cpu_subprocess_env
    from centroids_reid_tpu.engine import (
        CheckpointManager,
        create_train_state,
    )
    from centroids_reid_tpu.inference import (
        build_embeddings,
        export_retriever_from_config,
        load_retriever,
    )

    rng = np.random.RandomState(7)
    gallery = tmp_path / "gallery"
    gallery.mkdir()
    for pid in ("a", "b"):
        for i in range(4):
            Image.fromarray(
                rng.randint(0, 255, (32, 16, 3), np.uint8)
            ).save(gallery / f"{pid}_{i}.jpg")

    cfg = _cfg()
    cfg.TPU.NUM_GROUPS = 1
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.OUTPUT_DIR = str(tmp_path / "index")
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()
    cfg.DATASETS.ROOT_DIR = str(gallery)
    build_embeddings(cfg, images_in_subfolders=False)

    artifact = str(tmp_path / "retriever.crtpu")
    meta = export_retriever_from_config(
        cfg, cfg.OUTPUT_DIR, artifact, k=3, batch_size=4,
        platforms=("cpu",),
    )
    assert meta["gallery_size"] == 8

    img = open(gallery / "b_1.jpg", "rb").read()
    expected = load_retriever(artifact).query_bytes([img])

    # no checkpoint, no index: the artifact is the whole deployment
    shutil.rmtree(tmp_path / "logs")
    shutil.rmtree(cfg.OUTPUT_DIR)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    log = tmp_path / "serve.log"
    with open(log, "wb") as lf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(root, "inference", "serve.py"),
             "--artifact", artifact, "--port", str(port)],
            stdout=lf, stderr=subprocess.STDOUT,
            env=cpu_subprocess_env(), cwd=str(tmp_path),
        )
        try:
            deadline = time.time() + 300
            while time.time() < deadline:
                if proc.poll() is not None:
                    pytest.fail(
                        "serve.py died:\n" + log.read_text()[-2000:]
                    )
                if "RetrievalHTTPServer on" in log.read_text(
                        errors="replace"):
                    break
                time.sleep(0.5)
            else:
                pytest.fail(
                    "serve.py never came up:\n" + log.read_text()[-2000:]
                )
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
                health = json_mod.loads(r.read())
            assert health["gallery_size"] == 8 and health["k"] == 3
            assert health["model"] == "resnet18"

            req = urllib.request.Request(
                base + "/search",
                data=json_mod.dumps({
                    "images_b64": [base64.b64encode(img).decode()]
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json_mod.loads(r.read())
            got = out["results"][0]
            d_e, i_e, p_e = expected
            assert got["paths"] == [str(p) for p in p_e[0]]
            assert got["indices"] == [int(j) for j in i_e[0]]
            np.testing.assert_allclose(
                got["distances"], d_e[0], rtol=0, atol=1e-5
            )
            # and the artifact's own query image ranks itself first
            assert os.path.basename(got["paths"][0]) == "b_1.jpg"
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=120)
            assert rc == 0, log.read_text()[-2000:]
        finally:
            if proc.poll() is None:
                proc.kill()


def test_retriever_live_rank_stage(tmp_path):
    """Round-5 artifact contract: the exported program is the EMBED stage
    only and ranking runs the live service path at load — so the bf16
    kernel config matches the live service's rankings too, and pre-v5
    fused-rank artifacts are rejected with the re-export message."""
    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
    )

    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    rng = np.random.RandomState(9)
    emb = rng.randn(40, 512).astype(np.float32)
    paths = np.array([f"item_{i:03d}" for i in range(40)])
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, emb, paths, k=5, batch_size=4,
        platforms=("cpu",),
    )
    assert meta["rank_stage"] == "live"
    path = str(tmp_path / "retriever.crtpu")
    save_artifact(path, blob, meta, aux=aux)

    imgs = rng.randint(0, 256, (4, 32, 16, 3), np.uint8)
    svc = RetrievalService(
        cfg, emb, paths, k=5, normalize=True, use_bf16_kernel=False,
        model_bundle=(model, params, batch_stats),
    )
    ret = load_retriever(path, use_bf16_kernel=False)
    d_s, i_s, _ = svc.query_arrays(imgs)
    d_a, i_a, _ = ret.query_arrays(imgs)
    np.testing.assert_array_equal(i_a, i_s)
    np.testing.assert_allclose(d_a, d_s, atol=1e-5)

    # auto kernel selection mirrors the live server default: bf16+Pallas
    # only on TPU backends, exact fp32 elsewhere (the bf16 kernels do not
    # lower on CPU — same constraint as RetrievalService itself)
    auto = load_retriever(path)
    want = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    assert auto._gf.dtype == want

    # a fused-rank artifact from an older export must refuse loudly
    meta_old = {k: v for k, v in meta.items() if k != "rank_stage"}
    old = str(tmp_path / "old.crtpu")
    save_artifact(old, blob, meta_old, aux=aux)
    with pytest.raises(ValueError, match="re-export"):
        load_retriever(old)


def test_retriever_int8_roundtrip(tmp_path):
    """Retriever artifact with the int8 PTQ embed stage baked in: results
    must match the live int8 RetrievalService (same qfn), proving the
    quantized one-dispatch pipeline survives export."""
    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
    )
    from centroids_reid_tpu.models.quantized import quantize_reid_model

    cfg = _cfg()
    model, params, batch_stats = _tiny_model(cfg)
    rng = np.random.RandomState(8)
    calib = rng.randint(0, 256, (8, 32, 16, 3), np.uint8)
    qfn = quantize_reid_model(
        model, params, batch_stats, [calib],
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
    )
    emb = rng.randn(24, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(24)])
    svc = RetrievalService(
        cfg, emb, paths, k=4, normalize=True, use_bf16_kernel=False,
        model_bundle=(model, params, batch_stats), int8_qfn=qfn,
    )
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, emb, paths, k=4, batch_size=4,
        platforms=("cpu",), int8_qfn=qfn,
    )
    assert meta["quantized"] is True and meta["ingest"] == "rgb"
    path = str(tmp_path / "int8_retriever.crtpu")
    save_artifact(path, blob, meta, aux=aux)
    ret = load_retriever(path)

    imgs = rng.randint(0, 256, (4, 32, 16, 3), np.uint8)
    d_s, i_s, _ = svc.query_arrays(imgs)
    d_a, i_a, _ = ret.query_arrays(imgs)
    # int8 export is not bit-exact (constant-folding changes float
    # association at quantization boundaries — see
    # test_export_int8_program); the ranking contract is agreement on
    # clear winners: top-1 must match, distances close
    assert (i_a[:, 0] == i_s[:, 0]).all()
    np.testing.assert_allclose(d_a, d_s, atol=5e-2)
