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


def test_async_checkpointing_ring_and_best(tmp_path):
    """Async saves: restorable checkpoints, deferred ring pruning and
    deferred previous-best deletion both settle at wait()/close() with
    write-new-before-delete ordering preserved."""
    import os

    import jax
    import numpy as np

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import (
        CheckpointManager,
        create_train_state,
        restore_state,
    )
    from centroids_reid_tpu.models import create_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)

    mgr = CheckpointManager(str(tmp_path / "logs"), n_saved=1, use_async=True)
    assert mgr._async
    for epoch in range(3):
        mgr.save_periodic(epoch, state, cfg)
        assert mgr.save_if_best(epoch, state, float(epoch), cfg)
    mgr.close()

    # ring kept only the newest periodic entry; best kept only epoch=2
    ring = sorted(os.listdir(mgr.auto_dir))
    assert [d for d in ring if not d.endswith(".yml")] == ["checkpoint_epoch2"]
    best = [d for d in os.listdir(mgr.best_dir) if not d.endswith(".yml")]
    assert best == ["epoch=2"]

    restored = restore_state(mgr.latest_periodic(), state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_ring_ignores_leftover_orbax_tmp_dirs(tmp_path):
    """A crash inside the (async) orbax write window leaves
    checkpoint_epochN.orbax-checkpoint-tmp-* dirs; resume and pruning
    must skip them instead of crashing on the int() parse."""
    import os

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import CheckpointManager, create_train_state
    from centroids_reid_tpu.models import create_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)

    mgr = CheckpointManager(str(tmp_path / "logs"), n_saved=2)
    mgr.save_periodic(0, state, cfg)
    mgr.close()
    # simulate an interrupted async write
    os.makedirs(
        os.path.join(mgr.auto_dir,
                     "checkpoint_epoch5.orbax-checkpoint-tmp-12345")
    )
    assert mgr._ring_entries() == ["checkpoint_epoch0"]
    assert mgr.latest_periodic().endswith("checkpoint_epoch0")
    mgr._prune_ring()  # must not raise


def test_balanced_slice_covers_and_never_empty():
    """The multi-host extraction split: contiguous, covering, non-empty
    whenever n >= n_proc (the old ceil-chunk split handed trailing ranks
    empty slices for e.g. n=9, p=8 — crash + allgather hang)."""
    from centroids_reid_tpu.engine.evaluate import balanced_slice

    for n, p in [(9, 8), (5, 4), (8, 8), (17, 4), (1000, 7), (8, 1)]:
        spans = [balanced_slice(n, p, r) for r in range(p)]
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (lo, hi), (lo2, _) in zip(spans, spans[1:]):
            assert hi == lo2
        assert all(hi > lo for lo, hi in spans)
        assert max(hi - lo for lo, hi in spans) <= -(-n // p)
