"""Device-resident data helpers + mesh-sharded resident fit."""

import numpy as np
import pytest

import jax

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.data import init_dataset
from centroids_reid_tpu.data.device_data import (
    bank_size_mb,
    build_image_bank,
    plan_to_arrays,
)
from centroids_reid_tpu.data.sampler import build_epoch_plan
from test_integration import _make_separable_market


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = _make_separable_market(tmp_path_factory.mktemp("ds"))
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = root
    return init_dataset("market1501", cfg)


def test_image_bank_and_plan_arrays(ds):
    bank = build_image_bank(ds.train, (32, 16))
    assert bank.shape == (len(ds.train), 32, 16, 3)
    assert bank.dtype == np.uint8
    assert bank_size_mb(ds.train, (32, 16)) == pytest.approx(
        len(ds.train) * 32 * 16 * 3 / 1e6
    )

    plan = build_epoch_plan(ds.train_dict, 4, 4, 2, epoch=0,
                            use_resampling=False)
    idx, labels, is_real = plan_to_arrays(plan, ds.train)
    steps = plan.num_steps
    assert idx.shape == (steps, 2, 16)
    assert labels.shape == idx.shape and is_real.shape == idx.shape
    # labels consistent with the records the indices point at
    pids = np.asarray([r.pid for r in ds.train])
    np.testing.assert_array_equal(labels, pids[idx])
    # pid-major: 4 consecutive slots share a label
    lab0 = labels[0, 0].reshape(4, 4)
    assert (lab0 == lab0[:, :1]).all()


def test_resident_fit_on_mesh(ds, tmp_path):
    """Device-resident epoch runner executes sharded over a 2-device mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    import os

    from centroids_reid_tpu.engine import fit

    cfg = get_default_cfg()
    # rebuild root from a record path: .../market1501/bounding_box_train/x.jpg
    cfg.DATASETS.ROOT_DIR = os.path.dirname(
        os.path.dirname(os.path.dirname(ds.train[0].path))
    )
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.EVAL_PERIOD = 1
    cfg.SOLVER.USE_WARMUP_LR = False
    cfg.DATALOADER.USE_RESAMPLING = False
    cfg.TPU.NUM_GROUPS = 2
    assert cfg.TPU.DEVICE_RESIDENT_DATA
    out = fit(cfg, "ctl", str(tmp_path / "mesh_run"))
    assert np.isfinite(out["test_centroids_mAP"])
