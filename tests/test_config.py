import pytest

from centroids_reid_tpu.config import get_default_cfg


def test_default_keys_match_reference_surface():
    cfg = get_default_cfg()
    # Spot-check the behavioural keys SURVEY.md §2.1 calls out.
    assert cfg.MODEL.NAME == "resnet50"
    assert cfg.MODEL.LAST_STRIDE == 1
    assert cfg.MODEL.KEEP_CAMID_CENTROIDS is True
    assert cfg.DATALOADER.NUM_INSTANCE == 4
    assert cfg.DATALOADER.USE_RESAMPLING is True
    assert cfg.SOLVER.IMS_PER_BATCH == 64
    assert cfg.SOLVER.BASE_LR == 1e-4
    assert cfg.SOLVER.LR_STEPS == (40, 70)
    assert cfg.SOLVER.WARMUP_EPOCHS == 10
    assert cfg.SOLVER.CENTER_LOSS_WEIGHT == 0.0005
    assert cfg.TEST.FEAT_NORM is True
    assert cfg.REPRODUCIBLE_NUM_RUNS == 3


def test_merge_from_list_coercion():
    cfg = get_default_cfg()
    cfg.merge_from_list(
        [
            "MODEL.USE_CENTROIDS", "True",
            "SOLVER.BASE_LR", "0.00035",
            "SOLVER.IMS_PER_BATCH", "16",
            "DATALOADER.USE_RESAMPLING", "False",
            "INPUT.SIZE_TRAIN", "[320, 320]",
            "MODEL.NAME", "resnet50_ibn_a",
        ]
    )
    assert cfg.MODEL.USE_CENTROIDS is True
    assert cfg.SOLVER.BASE_LR == pytest.approx(0.00035)
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.DATALOADER.USE_RESAMPLING is False
    assert cfg.INPUT.SIZE_TRAIN == [320, 320]
    assert cfg.MODEL.NAME == "resnet50_ibn_a"


def test_merge_from_reference_yaml(tmp_path):
    # The reference ships configs/256_resnet50.yml with this shape.
    yml = tmp_path / "cfg.yml"
    yml.write_text(
        """
MODEL:
  NAME: 'resnet50'
  PRETRAIN_PATH: '/models/r50.pth'
INPUT:
  SIZE_TRAIN: [256, 128]
SOLVER:
  BASE_LR: 0.00035
"""
    )
    cfg = get_default_cfg()
    cfg.merge_from_file(str(yml))
    assert cfg.MODEL.PRETRAIN_PATH == "/models/r50.pth"
    assert cfg.SOLVER.BASE_LR == pytest.approx(0.00035)


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NOT_A_KEY", "1"])


def test_clone_and_freeze():
    cfg = get_default_cfg()
    c2 = cfg.clone()
    c2.MODEL.NAME = "resnet18"
    assert cfg.MODEL.NAME == "resnet50"
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.NAME = "resnet34"
