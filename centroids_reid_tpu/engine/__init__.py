from .checkpoint import CheckpointManager, epoch_of_checkpoint, restore_state
from .evaluate import (
    compute_reid_metrics,
    evaluate_on_train,
    extract_embeddings,
    make_embed_fn,
    run_validation,
)
from .fit import build_model_and_state, fit, num_groups
from .logging import MetricsLogger, next_version_dir
from .runner import load_model_for_test, run_main, run_single
from .state import TrainState, create_train_state
from .steps import make_train_step

__all__ = [
    "CheckpointManager",
    "epoch_of_checkpoint",
    "restore_state",
    "compute_reid_metrics",
    "evaluate_on_train",
    "extract_embeddings",
    "make_embed_fn",
    "run_validation",
    "build_model_and_state",
    "fit",
    "num_groups",
    "MetricsLogger",
    "next_version_dir",
    "load_model_for_test",
    "run_main",
    "run_single",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
