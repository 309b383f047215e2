from .datasets import (
    Record,
    ReidDataset,
    init_dataset,
    load_coco_reid,
    load_dukemtmc,
    load_market1501,
)
from .loader import EvalLoader, ImageStore, TrainLoader
from .sampler import EpochPlan, build_epoch_plan, occurrences_per_pid
from .transforms import augment_batch, load_and_resize, normalize_batch

__all__ = [
    "Record",
    "ReidDataset",
    "init_dataset",
    "load_coco_reid",
    "load_dukemtmc",
    "load_market1501",
    "EvalLoader",
    "ImageStore",
    "TrainLoader",
    "EpochPlan",
    "build_epoch_plan",
    "occurrences_per_pid",
    "augment_batch",
    "load_and_resize",
    "normalize_batch",
]
