from .rerank import rerank_distmat
from .retrieval import topk_retrieval

__all__ = ["rerank_distmat", "topk_retrieval"]
