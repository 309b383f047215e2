from .retrieval import topk_retrieval

__all__ = ["topk_retrieval"]
