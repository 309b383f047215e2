"""Model parity tests against a functional torch oracle.

The oracle (tests/torch_oracle.py) executes torch.nn.functional ops in the
reference's documented order: stem ReLU removed for the plain ResNet
(/root/reference/modelling/backbones/resnet.py:97,125), kept for IBN-a
(resnet_ibn_a.py:129), layer4 stride = LAST_STRIDE (resnet.py:102-103).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.models import build_backbone
from centroids_reid_tpu.models.resnet import _ARCHS

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    randomize_params,
    randomize_stats,
    resnet_trunk,
)


def _init_backbone(arch, last_stride, hw=(64, 32), seed=0):
    backbone = build_backbone(arch, last_stride)
    x = jnp.zeros((1, hw[0], hw[1], 3))
    variables = backbone.init(jax.random.PRNGKey(seed), x, train=False)
    params = randomize_params(
        jax.tree.map(np.asarray, variables["params"]), seed
    )
    batch_stats = randomize_stats(
        jax.tree.map(np.asarray, variables["batch_stats"]), seed + 1
    )
    return backbone, params, batch_stats


@pytest.mark.parametrize(
    "arch,last_stride",
    [("resnet18", 1), ("resnet50", 1), ("resnet50", 2), ("resnet50_ibn_a", 1)],
)
def test_backbone_matches_torch_oracle(arch, last_stride):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 32).astype(np.float32)

    backbone, params, batch_stats = _init_backbone(arch, last_stride)
    out = backbone.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)

    spec = _ARCHS[arch]
    ref = resnet_trunk(
        x, params, batch_stats,
        layers=spec["layers"],
        last_stride=last_stride,
        bottleneck_blocks=spec["block"].__name__ == "Bottleneck",
        stem_relu=spec["ibn"],
    ).numpy()

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_last_stride_doubles_spatial_size():
    _, p1, s1 = _init_backbone("resnet18", 1)
    b1 = build_backbone("resnet18", 1)
    b2 = build_backbone("resnet18", 2)
    x = jnp.zeros((1, 64, 32, 3))
    o1 = b1.apply({"params": p1, "batch_stats": s1}, x, train=False)
    v2 = b2.init(jax.random.PRNGKey(0), x, train=False)
    o2 = b2.apply(v2, x, train=False)
    assert o1.shape[1] == 2 * o2.shape[1]
    assert o1.shape[2] == 2 * o2.shape[2]


def test_converter_maps_torch_names():
    """State-dict style keys (torch conventions) land in the right flax slots."""
    from centroids_reid_tpu.models.convert import convert_backbone_state_dict

    sd = {
        "conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "bn1.weight": np.ones((64,), np.float32),
        "bn1.bias": np.zeros((64,), np.float32),
        "bn1.running_mean": np.zeros((64,), np.float32),
        "bn1.running_var": np.ones((64,), np.float32),
        "bn1.num_batches_tracked": np.array(5),
        "layer1.0.conv1.weight": np.zeros((64, 64, 1, 1), np.float32),
        "layer1.0.downsample.0.weight": np.zeros((256, 64, 1, 1), np.float32),
        "layer1.0.downsample.1.weight": np.ones((256,), np.float32),
        "layer1.0.downsample.1.running_mean": np.zeros((256,), np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),  # must be skipped
        "base.layer2.0.conv2.weight": np.zeros((128, 128, 3, 3), np.float32),
    }
    params, batch_stats = convert_backbone_state_dict(sd)
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["bn1"]["scale"].shape == (64,)
    assert batch_stats["bn1"]["mean"].shape == (64,)
    assert params["layer1_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 256)
    assert batch_stats["layer1_0"]["downsample_bn"]["mean"].shape == (256,)
    assert params["layer2_0"]["conv2"]["kernel"].shape == (3, 3, 128, 128)
    assert "fc" not in params


def test_ibn_backbone_structure():
    backbone = build_backbone("resnet50_ibn_a", 1)
    x = jnp.zeros((1, 64, 32, 3))
    variables = backbone.init(jax.random.PRNGKey(1), x, train=False)
    p = variables["params"]
    # IBN modules in layers 1-3, plain BN in layer4 (resnet_ibn_a.py:116-118)
    assert "IN" in p["layer1_0"]["bn1"]
    assert "IN" in p["layer3_0"]["bn1"]
    assert "IN" not in p["layer4_0"]["bn1"]


def test_reid_model_embed_is_bn_of_gap():
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.models import create_model, init_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    model = create_model(cfg, num_classes=5)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
    feat, bn_feat, logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    assert feat.shape == (2, 512)
    assert logits.shape == (2, 5)
    emb = model.apply(
        {"params": params, "batch_stats": batch_stats}, x,
        method=model.embed,
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(bn_feat), atol=1e-5)


def test_s2d_stem_matches_plain_stem():
    """The space-to-depth stem is an exact rearrangement of the 7x7/s2 conv.

    Same (7,7,3,64) parameter, same output (up to reduction order), same
    gradient — and odd input sizes fall back to the plain path. Covers the
    TPU.SPACE_TO_DEPTH_STEM default-on path against the reference stem
    (/root/reference/modelling/backbones/resnet.py:93)."""
    from centroids_reid_tpu.models.resnet import StemConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3), jnp.float32)
    plain, s2d = StemConv(64, s2d=False), StemConv(64, s2d=True)
    v = plain.init(rng, x)
    assert v["params"]["kernel"].shape == (7, 7, 3, 64)

    y0, y1 = plain.apply(v, x), s2d.apply(v, x)
    assert y0.shape == y1.shape == (2, 32, 16, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    def loss(mod, v, x):
        return (mod.apply(v, x) ** 2).sum()

    g0 = jax.grad(lambda v: loss(plain, v, x))(v)["params"]["kernel"]
    g1 = jax.grad(lambda v: loss(s2d, v, x))(v)["params"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=2e-4, atol=1e-3
    )

    gx0 = jax.grad(lambda x: loss(plain, v, x))(x)
    gx1 = jax.grad(lambda x: loss(s2d, v, x))(x)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=2e-4)

    # odd spatial size: both modules share params and agree via fallback
    xo = jax.random.normal(jax.random.PRNGKey(2), (1, 63, 33, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(plain.apply(v, xo)), np.asarray(s2d.apply(v, xo)), atol=2e-5
    )
