from .rerank import rerank_distmat, rerank_topk
from .retrieval import topk_retrieval
from .retrieval_int8 import (
    Int8Gallery,
    quantize_gallery,
    topk_retrieval_int8,
)

__all__ = [
    "Int8Gallery",
    "quantize_gallery",
    "rerank_distmat",
    "rerank_topk",
    "topk_retrieval",
    "topk_retrieval_int8",
]
