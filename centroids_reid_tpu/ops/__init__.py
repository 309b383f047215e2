from .rerank import rerank_distmat, rerank_topk
from .retrieval import topk_retrieval

__all__ = ["rerank_distmat", "rerank_topk", "topk_retrieval"]
