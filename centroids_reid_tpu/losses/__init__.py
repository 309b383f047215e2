from .centroid import ctl_centroid_loss
from .classification import center_loss, cross_entropy_label_smooth, init_centers
from .distances import (
    cosine_dist,
    cosine_sim,
    euclidean_dist,
    get_dist_func,
    l2_normalize,
    squared_euclidean_dist,
)
from .triplet import batch_hard_mine, triplet_loss

__all__ = [
    "ctl_centroid_loss",
    "center_loss",
    "cross_entropy_label_smooth",
    "init_centers",
    "cosine_dist",
    "cosine_sim",
    "euclidean_dist",
    "get_dist_func",
    "l2_normalize",
    "squared_euclidean_dist",
    "batch_hard_mine",
    "triplet_loss",
]
