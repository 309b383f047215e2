"""Flagship-resolution converted-checkpoint parity (VERDICT round 1, #2).

The strongest offline stand-in for "Market1501 mAP parity with reference
checkpoints" (BASELINE.md:21): a random torch-convention state_dict shaped
exactly like a reference Lightning checkpoint (backbone.* + bn.* +
fc_query.weight + center_loss.centers, /root/reference/modelling/bases.py:83-87)
is pushed through models/convert.py and the flax model at the flagship
256x128 fp32 configuration, and compared against a torch-functional oracle
that consumes the state_dict DIRECTLY (no converter on the oracle side, so
mapping bugs cannot cancel out). Plus the .ckpt -> orbax -> reload
roundtrip used by TEST.ONLY_TEST (utils/misc.py:128-139).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.models import create_model, init_model
from centroids_reid_tpu.models.convert import convert_full_state_dict, graft

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    make_reference_state_dict,
    reid_embed_from_state_dict,
)

_NUM_CLASSES = 751  # Market1501


def _flagship_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet50"
    cfg.MODEL.LAST_STRIDE = 1
    cfg.USE_MIXED_PRECISION = False
    # params are spatial-size independent; init small to keep the 1-core
    # CPU init cheap, then apply at the flagship 256x128
    cfg.INPUT.SIZE_TRAIN = [64, 32]
    cfg.INPUT.SIZE_TEST = [256, 128]
    return cfg


@pytest.fixture(scope="module")
def converted_model():
    sd = make_reference_state_dict(num_classes=_NUM_CLASSES, seed=0)
    cfg = _flagship_cfg()
    model = create_model(cfg, num_classes=_NUM_CLASSES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 32))
    conv = convert_full_state_dict(sd)
    params = graft(params, conv["params"])
    batch_stats = graft(batch_stats, conv["batch_stats"])
    return sd, model, params, batch_stats


def test_converted_checkpoint_embed_parity_256x128(converted_model):
    """Converted-ckpt embed()+logits at 256x128 fp32 vs the sd oracle."""
    sd, model, params, batch_stats = converted_model
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 256, 128).astype(np.float32)

    emb_ref, logits_ref = reid_embed_from_state_dict(
        x, sd, layers=(3, 4, 6, 3), last_stride=1, stem_relu=False
    )
    emb_ref, logits_ref = emb_ref.numpy(), logits_ref.numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    feat, bn_feat, logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x_nhwc, train=False
    )
    emb = model.apply(
        {"params": params, "batch_stats": batch_stats}, x_nhwc,
        method=model.embed,
    )
    emb, logits = np.asarray(emb), np.asarray(logits)
    np.testing.assert_allclose(emb, np.asarray(bn_feat), atol=1e-5)

    # depth x resolution accumulation: require tight agreement both
    # element-wise and directionally (what retrieval actually consumes)
    np.testing.assert_allclose(emb, emb_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-3, atol=2e-3)
    for i in range(emb.shape[0]):
        cos = np.dot(emb[i], emb_ref[i]) / (
            np.linalg.norm(emb[i]) * np.linalg.norm(emb_ref[i])
        )
        assert cos > 1 - 1e-6, cos
    # centers conversion is exact
    conv = convert_full_state_dict(sd)
    np.testing.assert_array_equal(conv["centers"], sd["center_loss.centers"])


def test_reference_ckpt_roundtrip_through_orbax(tmp_path, converted_model):
    """.ckpt (torch, Lightning layout) -> load_model_for_test -> orbax save
    -> restore: the exact TEST.ONLY_TEST path (runner.py / misc.py:128-139)."""
    sd, model, params, batch_stats = converted_model
    ckpt_path = tmp_path / "reference.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.array(v))
                               for k, v in sd.items()}}, str(ckpt_path))

    cfg = _flagship_cfg()
    cfg.DATASETS.ROOT_DIR = str(tmp_path)  # unused by loading
    cfg.MODEL.PRETRAIN_PATH = str(ckpt_path)
    cfg.TEST.ONLY_TEST = True

    from centroids_reid_tpu.engine.runner import load_model_for_test

    class _FakeDataset:
        num_classes = _NUM_CLASSES

    model2, params2, batch_stats2 = load_model_for_test(cfg, _FakeDataset())
    # identical trees to the directly converted ones
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        params2, params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        batch_stats2, batch_stats,
    )

    # orbax roundtrip of a full train state carrying the converted weights
    from centroids_reid_tpu.engine.checkpoint import (
        CheckpointManager,
        restore_state,
    )
    from centroids_reid_tpu.engine.state import create_train_state

    state, _ = create_train_state(cfg, model, _NUM_CLASSES, seed=0)
    state = state.replace(
        params={**state.params, "model": params},
        batch_stats=batch_stats,
    )
    mgr = CheckpointManager(str(tmp_path / "run"), n_saved=1)
    mgr.save_periodic(epoch=0, state=state, cfg=cfg)
    path = mgr.latest_periodic()
    restored = restore_state(path, jax.tree.map(np.zeros_like, state))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        restored.params["model"], params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        restored.batch_stats, batch_stats,
    )
