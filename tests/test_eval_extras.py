"""Extras: evaluate_on_train and TEST.VISUALIZE wiring."""

import os

import numpy as np
import pytest

import jax

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.data import init_dataset
from centroids_reid_tpu.engine import (
    create_train_state,
    evaluate_on_train,
    run_validation,
)
from centroids_reid_tpu.models import create_model
from test_integration import _make_separable_market


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    return _make_separable_market(tmp_path_factory.mktemp("ds"))


def _setup(ds_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = ds_root
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TEST.IMS_PER_BATCH = 16
    cfg.TPU.NUM_GROUPS = 1
    ds = init_dataset("market1501", cfg)
    model = create_model(cfg, num_classes=ds.num_classes)
    state, _ = create_train_state(cfg, model, ds.num_classes, seed=0)
    return cfg, ds, model, state


def test_evaluate_on_train(ds_root):
    cfg, ds, model, state = _setup(ds_root)
    out = evaluate_on_train(
        cfg, model, state.params["model"], state.batch_stats, ds,
        use_centroids=True,
    )
    assert "Train mAP" in out and np.isfinite(out["Train mAP"])
    assert "Train Top-1" in out


def test_visualize_during_validation(ds_root, tmp_path):
    cfg, ds, model, state = _setup(ds_root)
    cfg.TEST.VISUALIZE = "yes"
    cfg.TEST.VISUALIZE_TOPK = 3
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    run_validation(
        cfg, model, state.params["model"], state.batch_stats, ds,
        use_centroids=False,
    )
    vis = os.path.join(cfg.OUTPUT_DIR, "visrank")
    pngs = [f for f in os.listdir(vis) if f.endswith(".png")]
    assert len(pngs) == ds.num_query


def test_visualize_pins_materialising_eval(ds_root, tmp_path, monkeypatch):
    """TEST.VISUALIZE needs evaluator.last_distmat, which the streaming
    evaluator never builds — run_validation must pin streaming=False even
    when the Q*G auto-switch would otherwise trigger it."""
    import centroids_reid_tpu.metrics.r1_map as r1_map

    monkeypatch.setattr(r1_map, "_STREAMING_CELLS", 0)  # always auto-stream
    cfg, ds, model, state = _setup(ds_root)
    cfg.TEST.VISUALIZE = "yes"
    cfg.TEST.VISUALIZE_TOPK = 3
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    out = run_validation(
        cfg, model, state.params["model"], state.batch_stats, ds,
        use_centroids=False,
    )
    assert np.isfinite(out["mAP"])
    vis = os.path.join(cfg.OUTPUT_DIR, "visrank")
    assert len([f for f in os.listdir(vis) if f.endswith(".png")]) \
        == ds.num_query
