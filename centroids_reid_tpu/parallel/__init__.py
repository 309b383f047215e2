from .mesh import (
    DATA_AXIS,
    GALLERY_AXIS,
    gallery_sharded,
    group_sharded,
    make_data_mesh,
    make_retrieval_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "GALLERY_AXIS",
    "gallery_sharded",
    "group_sharded",
    "make_data_mesh",
    "make_retrieval_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "sharded_topk",
]
from .retrieval import sharded_topk
