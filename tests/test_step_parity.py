"""Whole-train-step loss parity: the composed CTL objective (masked BNNeck,
xent, center, query triplet, centroid triplet with weights) against torch
oracle computations on identical features and parameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from torch_oracle import oracle_center_loss, oracle_ctl_loss, oracle_triplet  # noqa: E402

from centroids_reid_tpu.config import get_default_cfg  # noqa: E402
from centroids_reid_tpu.engine import create_train_state  # noqa: E402
from centroids_reid_tpu.engine.steps import make_train_step  # noqa: E402
from centroids_reid_tpu.models import create_model  # noqa: E402


def test_ctl_step_total_loss_matches_oracle():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 4   # P
    cfg.SOLVER.QUERY_XENT_WEIGHT = 0.7
    cfg.SOLVER.QUERY_CONTRASTIVE_WEIGHT = 1.3
    cfg.SOLVER.CENTROID_CONTRASTIVE_WEIGHT = 0.9
    num_classes = 8
    k = 4

    model = create_model(cfg, num_classes=num_classes)
    state, tx = create_train_state(cfg, model, num_classes, seed=0)
    step = jax.jit(make_train_step(model, tx, cfg, num_classes, "ctl"))

    rng = np.random.RandomState(0)
    pk = 4 * k
    labels = np.repeat(rng.choice(num_classes, 4, replace=False), k)
    is_real = np.ones(pk, bool)
    is_real[k - 1] = False  # pid 0 has a mock in its last slot
    imgs = rng.randn(1, pk, 32, 16, 3).astype(np.float32)
    imgs[0, ~is_real] = 0.0
    batch = {
        "images": jnp.asarray(imgs),
        "labels": jnp.asarray(labels)[None],
        "is_real": jnp.asarray(is_real)[None],
    }
    _, metrics = step(state, batch)

    # --- oracle: recompute every term from the model's own features -------
    feats = np.asarray(
        model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            jnp.asarray(imgs[0]), train=True, method=model.features,
            mutable=["batch_stats"],
        )[0]
    ).astype(np.float32)
    tf = torch.from_numpy(feats)
    tl = torch.from_numpy(labels)
    tr = torch.from_numpy(is_real)

    q_loss, _, _ = oracle_triplet(tf, tl, margin=0.5, mask=tr)
    q_loss = float(q_loss) * cfg.SOLVER.QUERY_CONTRASTIVE_WEIGHT

    ctl = oracle_ctl_loss(tf, tl, tr, k, margin=0.5)
    centroid = float(ctl["loss"]) * cfg.SOLVER.CENTROID_CONTRASTIVE_WEIGHT

    c_loss = float(
        oracle_center_loss(
            tf[tr], tl[tr],
            torch.from_numpy(np.array(state.params["centers"])),
        )
    ) * cfg.SOLVER.CENTER_LOSS_WEIGHT

    # masked BNNeck (train mode over real rows) + fc + label-smooth xent
    real = tf[tr]
    mean = real.mean(0)
    var = real.var(0, unbiased=False)
    bn_out = (tf - mean) / torch.sqrt(var + 1e-5)
    scale = torch.from_numpy(np.array(state.params["model"]["bnneck"]["scale"]))
    bias = torch.from_numpy(np.array(state.params["model"]["bnneck"]["bias"]))
    bn_out = bn_out * scale + bias
    w = torch.from_numpy(np.array(state.params["model"]["fc_query"]["kernel"]))
    logits = (bn_out @ w)[tr]
    logp = F.log_softmax(logits, dim=1)
    onehot = torch.zeros_like(logp).scatter_(1, tl[tr][:, None], 1)
    t = 0.9 * onehot + 0.1 / num_classes
    xent = float((-t * logp).mean(0).sum()) * cfg.SOLVER.QUERY_XENT_WEIGHT

    expected = {
        "query_triplet": q_loss,
        "centroid_triplet": centroid,
        "query_center": c_loss,
        "query_xent": xent,
        "loss": q_loss + centroid + c_loss + xent,
    }
    for name, want in expected.items():
        got = float(metrics[name])
        assert got == pytest.approx(want, rel=2e-3, abs=2e-4), (
            f"{name}: got {got}, oracle {want}"
        )
