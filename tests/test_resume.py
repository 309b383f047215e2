"""Resume-training path: periodic checkpoint -> RESUME_TRAINING restart."""

import glob
import os

import numpy as np
import pytest

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import fit
from test_integration import _make_separable_market


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    return _make_separable_market(tmp_path_factory.mktemp("ds"))


def test_resume_from_periodic_checkpoint(ds_root, tmp_path):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = ds_root
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.EVAL_PERIOD = 2
    cfg.SOLVER.USE_WARMUP_LR = False
    cfg.DATALOADER.USE_RESAMPLING = False
    cfg.TPU.NUM_GROUPS = 1
    run1 = str(tmp_path / "run1")
    fit(cfg, "ctl", run1)

    # periodic ring kept exactly n_saved=1 checkpoint, of the last epoch
    autos = sorted(glob.glob(os.path.join(run1, "auto_checkpoints",
                                          "checkpoint_epoch*")))
    autos = [a for a in autos if os.path.isdir(a)]
    assert len(autos) == 1
    assert autos[0].endswith("checkpoint_epoch1")

    # resume for 2 more epochs from it
    cfg2 = cfg.clone()
    cfg2.MODEL.RESUME_TRAINING = True
    cfg2.MODEL.PRETRAIN_PATH = autos[0]
    cfg2.SOLVER.MAX_EPOCHS = 4
    run2 = str(tmp_path / "run2")
    out = fit(cfg2, "ctl", run2)
    assert np.isfinite(out["test_centroids_mAP"])

    # resumed run trained epochs 2..3 only: its ring holds epoch 3
    autos2 = [
        a for a in glob.glob(os.path.join(run2, "auto_checkpoints",
                                          "checkpoint_epoch*"))
        if os.path.isdir(a)
    ]
    assert autos2 and autos2[0].endswith("checkpoint_epoch3")

    # metrics log shows it started at epoch 2
    import json
    with open(os.path.join(run2, "train", "metrics.jsonl")) as f:
        # skip the hyperparameter snapshot record (no "step" key)
        steps = [
            rec["step"]
            for rec in map(json.loads, f)
            if "step" in rec
        ]
    assert min(steps) == 2
