"""int8 PTQ serving path vs the fp32 model (models/quantized.py).

Three layers of proof:
1. BN/input folding is exact math: the folded fp32 graph must match
   ``model.embed`` to fp32 tolerance (the only real difference is the
   mean-pixel border padding, < half a uint8 step in normalised space).
2. int8 quantization preserves the embedding geometry: high cosine
   similarity per embedding vs fp32.
3. Retrieval behaviour survives: mAP 1.0 on a separable synthetic set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.models import create_model, init_model
from centroids_reid_tpu.models.quantized import (
    folded_fp_embed,
    quantize_reid_model,
)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _model(name, hw, seed=0):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    model = create_model(cfg, num_classes=0)
    params, bstats = init_model(model, jax.random.PRNGKey(seed), hw)
    # randomise running stats (init is mean 0 / var 1 — make folding earn
    # it); squared+0.5 keeps the var leaves positive
    rng = np.random.RandomState(seed + 1)
    bstats = jax.tree.map(
        lambda v: jnp.asarray(
            rng.normal(0.0, 0.3, v.shape).astype(np.float32) ** 2 + 0.5
        ),
        bstats,
    )
    return cfg, model, params, bstats


def _embed_fp(model, params, bstats, imgs_u8):
    from centroids_reid_tpu.data.transforms import normalize_batch

    x = normalize_batch(jnp.asarray(imgs_u8), MEAN, STD, dtype=jnp.float32)
    return model.apply(
        {"params": params, "batch_stats": bstats}, x, method=model.embed
    )


def _imgs(n, hw, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, hw[0], hw[1], 3), np.uint8)


@pytest.mark.parametrize(
    "name", ["resnet18", "resnet50", "resnet50_ibn_a"]
)
def test_folded_fp_matches_model_embed(name):
    hw = (64, 32)
    cfg, model, params, bstats = _model(name, hw)
    imgs = _imgs(4, hw)
    ref = np.asarray(_embed_fp(model, params, bstats, imgs))
    got = np.asarray(
        folded_fp_embed(model, params, bstats, MEAN, STD)(jnp.asarray(imgs))
    )
    # folding is exact; the border mean-pixel pad is the only divergence
    cos = np.sum(ref * got, 1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
    )
    assert cos.min() > 0.99999, cos
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize(
    "name", ["resnet18", "resnet50", "resnet50_ibn_a"]
)
def test_int8_embedding_cosine(name):
    hw = (64, 32)
    cfg, model, params, bstats = _model(name, hw)
    calib = [_imgs(4, hw, seed=s) for s in range(2)]
    qfn = quantize_reid_model(model, params, bstats, calib, MEAN, STD)
    imgs = _imgs(8, hw, seed=7)
    ref = np.asarray(_embed_fp(model, params, bstats, imgs))
    got = np.asarray(qfn(jnp.asarray(imgs)))
    assert got.dtype == np.float32 and got.shape == ref.shape
    cos = np.sum(ref * got, 1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
    )
    assert cos.min() > 0.99, cos


def test_int8_preserves_retrieval_on_separable_data():
    """Quantized embeddings must rank a separable gallery identically."""
    hw = (64, 32)
    cfg, model, params, bstats = _model("resnet18", hw)
    rng = np.random.RandomState(3)
    pids = np.repeat(np.arange(8), 4)
    base = rng.randint(40, 216, (8, 1, 1, 3))
    imgs = np.clip(
        base[pids] + rng.randint(-15, 15, (32, hw[0], hw[1], 3)), 0, 255
    ).astype(np.uint8)

    qfn = quantize_reid_model(
        model, params, bstats, [imgs[:8]], MEAN, STD
    )
    emb_q = np.asarray(qfn(jnp.asarray(imgs)))
    emb_f = np.asarray(_embed_fp(model, params, bstats, imgs))

    def top1_acc(emb):
        e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sim = e @ e.T
        np.fill_diagonal(sim, -np.inf)
        return (pids[sim.argmax(1)] == pids).mean()

    # fp32 top-1 on this set and the quantized top-1 must agree
    assert top1_acc(emb_q) == top1_acc(emb_f)


def test_calibration_requires_batches():
    hw = (64, 32)
    cfg, model, params, bstats = _model("resnet18", hw)
    with pytest.raises(ValueError, match="calibration"):
        quantize_reid_model(model, params, bstats, [], MEAN, STD)


def test_quantized_save_load_roundtrip(tmp_path):
    import os
    hw = (64, 32)
    cfg, model, params, bstats = _model("resnet50", hw)
    qfn = quantize_reid_model(
        model, params, bstats, [_imgs(4, hw)], MEAN, STD
    )
    imgs = _imgs(6, hw, seed=9)
    ref = np.asarray(qfn(jnp.asarray(imgs)))

    from centroids_reid_tpu.models.quantized import QuantizedEmbed

    p = os.path.join(tmp_path, "model_int8.npz")
    qfn.save(p)
    qfn2 = QuantizedEmbed.load(p)
    got = np.asarray(qfn2(jnp.asarray(imgs)))
    np.testing.assert_array_equal(got, ref)


def test_percentile_calibration():
    """Outlier-clipped calibration produces tighter scales and embeddings
    that stay close to fp32."""
    hw = (64, 32)
    cfg, model, params, bstats = _model("resnet18", hw)
    calib = [_imgs(4, hw)]
    q_max = quantize_reid_model(
        model, params, bstats, calib, MEAN, STD, calib_percentile=100.0
    )
    q_pct = quantize_reid_model(
        model, params, bstats, calib, MEAN, STD, calib_percentile=99.5
    )
    for k, s_pct in q_pct.qtree["act_scales"].items():
        assert float(s_pct) <= float(q_max.qtree["act_scales"][k]) + 1e-9
    imgs = _imgs(8, hw, seed=5)
    ref = np.asarray(_embed_fp(model, params, bstats, imgs))
    got = np.asarray(q_pct(jnp.asarray(imgs)))
    cos = np.sum(ref * got, 1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
    )
    assert cos.min() > 0.98, cos


def test_int8_domain_instance_norm_identity():
    """Oracle for the int8-domain InstanceNorm rescaling identity
    (models/quantized._instance_norm_int8_domain): IN over int8 values
    with the eps/s^2 correction must equal fp32 IN over the dequantized
    values at float-rounding tolerance. The near-constant low-variance
    case makes the eps term MATERIAL: a wrong identity (eps*s^2, or a
    dropped s) is off by orders of magnitude there, far outside the e2e
    cosine>0.99 check's resolution."""
    from centroids_reid_tpu.models.quantized import (
        _instance_norm_int8_domain,
    )

    rng = np.random.RandomState(11)
    half = 8
    in_scale = (rng.randn(half) * 0.5 + 1.0).astype(np.float32)
    in_bias = (rng.randn(half) * 0.1).astype(np.float32)

    cases = []
    z_wide = rng.randint(-127, 128, (2, 7, 5, half)).astype(np.int8)
    cases.append(z_wide)
    # near-constant: var_int ~ 0.2, so eps/s^2 dominates at small s
    z_flat = (rng.randint(0, 2, (2, 7, 5, half)) + 3).astype(np.int8)
    cases.append(z_flat)

    for z in cases:
        for s in (0.004, 1.0, 37.5):
            got = np.asarray(_instance_norm_int8_domain(
                jnp.asarray(z), jnp.float32(s),
                jnp.asarray(in_scale), jnp.asarray(in_bias),
            ))
            real = z.astype(np.float64) * s
            mu = real.mean(axis=(1, 2), keepdims=True)
            var = ((real - mu) ** 2).mean(axis=(1, 2), keepdims=True)
            ref = (real - mu) / np.sqrt(var + 1e-5) * in_scale + in_bias
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
