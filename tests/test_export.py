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
