"""End-to-end integration: train on a synthetic separable dataset and reach
high mAP (SURVEY.md §4's prescribed integration test)."""

import os

import numpy as np
import pytest
from PIL import Image

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import fit, run_single


def _make_separable_market(tmp_path, n_pids=8, per_pid=6, hw=(32, 16)):
    """Each pid is a distinct solid colour + noise -> trivially separable."""
    root = tmp_path / "data"
    base = root / "market1501"
    rng = np.random.RandomState(0)
    colors = rng.randint(30, 225, (n_pids, 3))
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (base / sub).mkdir(parents=True)

    def write(subdir, pid, camid, i):
        arr = np.clip(
            colors[pid][None, None, :]
            + rng.randint(-20, 20, (hw[0], hw[1], 3)),
            0, 255,
        ).astype(np.uint8)
        Image.fromarray(arr).save(
            base / subdir / f"{pid + 1:04d}_c{camid}s1_{i:06d}_00.jpg"
        )

    for pid in range(n_pids):
        for i in range(per_pid):
            write("bounding_box_train", pid, (i % 6) + 1, i)
        for i in range(2):
            write("query", pid, 1, 100 + i)
        for i in range(3):
            write("bounding_box_test", pid, ((i % 5) + 2), 200 + i)
    return str(root)


def _make_noisy_eval_market(tmp_path, train_root, shift=80,
                            n_pids=8, q_per=6, g_per=9, hw=(32, 16)):
    """UNSATURATED eval set over the separable fixture's identities: each
    query/gallery image's base colour is shifted by a per-IMAGE uniform
    offset in [-shift, shift]^3 (comparable to the inter-class colour
    spacing), so identities bleed into neighbours and fp32 mAP lands
    meaningfully below 1.0. Per-pixel noise alone cannot do this (global
    pooling averages iid pixel noise to ~0). The train split is shared
    with ``train_root`` (the dataset factory requires it; ONLY_TEST never
    reads the images). Mirrors scripts/soak_canonical.py::
    make_hard_eval_dataset at test scale — the int8 deployment gate must
    discriminate on a metric that is not pinned at 1.0 (VERDICT r4 #6)."""
    import shutil

    root = tmp_path / "noisy_data"
    base = root / "market1501"
    base.mkdir(parents=True)
    src_train = os.path.join(train_root, "market1501",
                             "bounding_box_train")
    try:
        os.symlink(src_train, base / "bounding_box_train")
    except OSError:
        shutil.copytree(src_train, base / "bounding_box_train")
    (base / "query").mkdir()
    (base / "bounding_box_test").mkdir()

    # the SAME colour table as _make_separable_market (its first rng draw)
    colors = np.random.RandomState(0).randint(30, 225, (n_pids, 3))
    rng = np.random.RandomState(1)

    def write(subdir, pid, camid, i):
        s = rng.randint(-shift, shift + 1, (1, 1, 3))
        arr = np.clip(
            colors[pid][None, None, :] + s
            + rng.randint(-20, 20, (hw[0], hw[1], 3)),
            0, 255,
        ).astype(np.uint8)
        Image.fromarray(arr).save(
            base / subdir / f"{pid + 1:04d}_c{camid}s1_{i:06d}_00.jpg"
        )

    for pid in range(n_pids):
        for i in range(q_per):
            write("query", pid, 1, 100 + i)
        for i in range(g_per):
            write("bounding_box_test", pid, (i % 5) + 2, 200 + i)
    return str(root)


@pytest.fixture(scope="module")
def separable_root(tmp_path_factory):
    return _make_separable_market(tmp_path_factory.mktemp("ds"))


def _tiny_cfg(root, tmp_path, mode):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = root
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_EPOCHS = 3
    cfg.SOLVER.EVAL_PERIOD = 3
    cfg.SOLVER.BASE_LR = 3e-4
    cfg.SOLVER.USE_WARMUP_LR = False
    cfg.TEST.IMS_PER_BATCH = 16
    cfg.DATALOADER.USE_RESAMPLING = mode == "base"
    cfg.MODEL.USE_CENTROIDS = mode == "ctl"
    cfg.TPU.NUM_GROUPS = 1
    cfg.LOG_DIR = str(tmp_path / "logs")
    return cfg


def test_ctl_end_to_end(separable_root, tmp_path):
    cfg = _tiny_cfg(separable_root, tmp_path, "ctl")
    out = fit(cfg, "ctl", str(tmp_path / "run"))
    # colour-separable data: both eval modes should be near-perfect
    assert out["test_centroids_mAP"] > 0.95, out
    assert out["test_plain_mAP"] > 0.95, out
    assert out["test_centroids_Top-1"] > 0.95


def test_base_end_to_end(separable_root, tmp_path):
    """Baseline model (resampling, no centroid loss) trains and evals."""
    cfg = _tiny_cfg(separable_root, tmp_path, "base")
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.EVAL_PERIOD = 2
    out = fit(cfg, "base", str(tmp_path / "run_base"))
    assert out["test_plain_mAP"] > 0.9, out


def test_streaming_fallback_end_to_end(separable_root, tmp_path):
    """The streaming (non-device-resident) loop stays healthy."""
    cfg = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg.TPU.DEVICE_RESIDENT_DATA = False
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.EVAL_PERIOD = 2
    out = fit(cfg, "ctl", str(tmp_path / "run_stream"))
    assert out["test_centroids_mAP"] > 0.9, out


def test_only_test_path_with_orbax_checkpoint(separable_root, tmp_path):
    """Train briefly, then exercise the ONLY_TEST double-eval path from the
    saved checkpoint (misc.py:128-139 parity)."""
    import glob
    import os

    cfg = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.EVAL_PERIOD = 1
    fit(cfg, "ctl", str(tmp_path / "pretrain"))
    ckpts = glob.glob(
        str(tmp_path / "pretrain" / "checkpoints" / "epoch=*")
    )
    ckpts = [c for c in ckpts if os.path.isdir(c)]
    assert ckpts, "no best checkpoint saved"

    cfg2 = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg2.TEST.ONLY_TEST = True
    cfg2.MODEL.PRETRAIN_PATH = ckpts[0]
    cfg2.LOG_DIR = str(tmp_path / "logs2")
    out = run_single(cfg2, "ctl", "test_run")
    assert "test_centroids_mAP" in out and "test_plain_mAP" in out
    assert np.isfinite(out["test_centroids_mAP"])


def test_only_test_int8_deployment_accuracy(separable_root, tmp_path):
    """ONLY_TEST + TPU.INT8_EVAL reports the deployed int8 model's metrics;
    on a separable set the quantized model must match the fp32 mAP."""
    import glob
    import os

    cfg = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.EVAL_PERIOD = 1
    fit(cfg, "ctl", str(tmp_path / "pretrain_i8"))
    ckpts = [
        c for c in glob.glob(
            str(tmp_path / "pretrain_i8" / "checkpoints" / "epoch=*")
        ) if os.path.isdir(c)
    ]
    assert ckpts

    cfg2 = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg2.TEST.ONLY_TEST = True
    cfg2.MODEL.PRETRAIN_PATH = ckpts[0]
    cfg2.LOG_DIR = str(tmp_path / "logs_i8_fp")
    out_fp = run_single(cfg2, "ctl", "test_run_fp")

    cfg3 = _tiny_cfg(separable_root, tmp_path, "ctl")
    cfg3.TEST.ONLY_TEST = True
    cfg3.MODEL.PRETRAIN_PATH = ckpts[0]
    cfg3.TPU.INT8_EVAL = True
    cfg3.TPU.INT8_CALIB_BATCHES = 1
    cfg3.LOG_DIR = str(tmp_path / "logs_i8")
    out_q = run_single(cfg3, "ctl", "test_run_i8")
    assert out_q["test_plain_mAP"] == pytest.approx(
        out_fp["test_plain_mAP"], abs=0.05
    )
    assert out_q["test_centroids_mAP"] == pytest.approx(
        out_fp["test_centroids_mAP"], abs=0.05
    )
