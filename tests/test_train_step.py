"""Training-step smoke + invariant tests (synthetic data, CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine.state import create_train_state
from centroids_reid_tpu.engine.steps import make_train_step
from centroids_reid_tpu.models import create_model
from centroids_reid_tpu.solver import (
    current_learning_rate,
    lr_for_epoch,
    set_learning_rate,
)


def _cfg(mode="ctl"):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 4      # P
    cfg.DATALOADER.NUM_INSTANCE = 4   # K
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.DATALOADER.USE_RESAMPLING = mode == "base"
    return cfg


def _synthetic_batch(g=2, p=4, k=4, hw=(32, 16), num_classes=8, seed=0,
                     with_mocks=False):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(g, p * k, hw[0], hw[1], 3).astype(np.float32)
    # pid-major labels; distinct pids across groups like a real P x K batch
    labels = np.stack(
        [np.repeat(rng.choice(num_classes, p, replace=False), k) for _ in range(g)]
    )
    is_real = np.ones((g, p * k), bool)
    if with_mocks:
        is_real[:, 2 * k - 1] = False  # last slot of pid #2 is a mock
        imgs[~is_real] = 0.0
    return {
        "images": jnp.asarray(imgs),
        "labels": jnp.asarray(labels),
        "is_real": jnp.asarray(is_real),
    }


@pytest.mark.parametrize("mode,with_mocks", [("ctl", True), ("base", False)])
def test_train_step_runs_and_learns(mode, with_mocks):
    cfg = _cfg(mode)
    num_classes = 8
    model = create_model(cfg, num_classes=num_classes)
    state, tx = create_train_state(cfg, model, num_classes, seed=0)
    step = jax.jit(make_train_step(model, tx, cfg, num_classes, mode))
    batch = _synthetic_batch(with_mocks=with_mocks)

    frozen_bias_before = np.asarray(state.params["model"]["bnneck"]["bias"])
    centers_before = np.asarray(state.params["centers"])
    stats_before = np.asarray(state.batch_stats["backbone"]["bn1"]["mean"])

    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    if mode == "ctl":
        for key in ("centroid_triplet", "l2_mean_centroid"):
            assert np.isfinite(float(metrics[key]))

    # BNNeck bias is frozen (modelling/bases.py:83-84)
    np.testing.assert_array_equal(
        np.asarray(state.params["model"]["bnneck"]["bias"]), frozen_bias_before
    )
    # centers are trained by their own transform
    assert np.abs(np.asarray(state.params["centers"]) - centers_before).max() > 0
    # backbone BN running stats update in train mode
    assert np.abs(
        np.asarray(state.batch_stats["backbone"]["bn1"]["mean"]) - stats_before
    ).max() > 0


def test_bn_running_stats_cross_group_policy():
    """Cross-group BN running-stats policy vs the torch oracle (G>1).

    Policy (documented divergence, engine/steps.py docstring): per-group
    torch-momentum updates of the shared running value are averaged across
    groups, which equals torch momentum applied to the group-averaged batch
    statistic. The oracle is a real torch.nn.BatchNorm1d stepped on each
    group's REAL rows (the reference filters mocks before bn,
    train_ctl_model.py:69-74), updates averaged across groups."""
    import torch

    cfg = _cfg("ctl")
    num_classes = 8
    model = create_model(cfg, num_classes=num_classes)
    state, tx = create_train_state(cfg, model, num_classes, seed=0)
    step = jax.jit(make_train_step(model, tx, cfg, num_classes, "ctl"))
    batch = _synthetic_batch(g=2, with_mocks=True, seed=3)

    # the features the step's masked BNNeck saw (same params/stats, train
    # mode is deterministic)
    feats = []
    for gi in range(2):
        f, _ = model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            batch["images"][gi], train=True, method=model.features,
            mutable=["batch_stats"],
        )
        feats.append(np.asarray(f, np.float32))

    rm0 = np.asarray(state.batch_stats["bnneck"]["mean"])
    rv0 = np.asarray(state.batch_stats["bnneck"]["var"])

    new_state, _ = step(state, batch)

    # torch oracle: one BatchNorm1d per group from the same running stats
    updates = []
    for gi in range(2):
        bn = torch.nn.BatchNorm1d(feats[gi].shape[1], momentum=0.1, eps=1e-5)
        bn.running_mean.data = torch.from_numpy(rm0.copy())
        bn.running_var.data = torch.from_numpy(rv0.copy())
        bn.train()
        real = np.asarray(batch["is_real"][gi])
        bn(torch.from_numpy(feats[gi][real]))
        updates.append((bn.running_mean.numpy(), bn.running_var.numpy()))

    exp_mean = np.mean([u[0] for u in updates], axis=0)
    exp_var = np.mean([u[1] for u in updates], axis=0)
    got_mean = np.asarray(new_state.batch_stats["bnneck"]["mean"])
    got_var = np.asarray(new_state.batch_stats["bnneck"]["var"])
    np.testing.assert_allclose(got_mean, exp_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_var, exp_var, rtol=1e-4, atol=1e-5)


def test_lr_schedule_matches_reference_semantics():
    cfg = _cfg()
    cfg.SOLVER.BASE_LR = 3.5e-4
    # warmup epochs 0..9: (e+1)/10 * base (modelling/bases.py:115-121)
    assert lr_for_epoch(0, cfg) == pytest.approx(3.5e-5)
    assert lr_for_epoch(4, cfg) == pytest.approx(3.5e-4 * 0.5)
    assert lr_for_epoch(9, cfg) == pytest.approx(3.5e-4)
    # multistep (40, 70) x 0.1 (solver/build.py:55-59)
    assert lr_for_epoch(39, cfg) == pytest.approx(3.5e-4)
    assert lr_for_epoch(40, cfg) == pytest.approx(3.5e-5)
    assert lr_for_epoch(100, cfg) == pytest.approx(3.5e-6)
    # cosine
    cfg.SOLVER.LR_SCHEDULER_NAME = "cosine_annealing"
    cfg.SOLVER.USE_WARMUP_LR = False
    assert lr_for_epoch(0, cfg) == pytest.approx(3.5e-4)
    assert lr_for_epoch(60, cfg) == pytest.approx(3.5e-4 / 2, rel=1e-6)


def test_learning_rate_injection():
    cfg = _cfg()
    model = create_model(cfg, num_classes=8)
    state, tx = create_train_state(cfg, model, 8)
    assert current_learning_rate(state.opt_state) == pytest.approx(
        cfg.SOLVER.BASE_LR
    )
    new_opt = set_learning_rate(state.opt_state, 1e-5)
    assert current_learning_rate(new_opt) == pytest.approx(1e-5)


def test_train_step_shards_over_mesh():
    """The group axis shards over a multi-device mesh and executes."""
    from centroids_reid_tpu.parallel import make_data_mesh, replicate, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    cfg = _cfg()
    model = create_model(cfg, num_classes=8)
    state, tx = create_train_state(cfg, model, 8)
    step = jax.jit(make_train_step(model, tx, cfg, 8, "ctl"))

    mesh = make_data_mesh(4)
    batch = shard_batch(mesh, _synthetic_batch(g=4, with_mocks=True))
    state = replicate(mesh, state)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
