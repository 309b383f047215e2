from .api import build_embeddings, find_similar, load_inference_model
from .utils import (
    PID_EXTRACTORS,
    calculate_centroids,
    create_pid_path_index,
    list_images_flat,
    list_images_subfolders,
    run_inference,
)

__all__ = [
    "build_embeddings",
    "find_similar",
    "load_inference_model",
    "PID_EXTRACTORS",
    "calculate_centroids",
    "create_pid_path_index",
    "list_images_flat",
    "list_images_subfolders",
    "run_inference",
    "RetrievalService",
    "export_embedder",
    "export_from_config",
    "export_retriever",
    "export_retriever_from_config",
    "load_embedder",
    "load_retriever",
]
from .export import (
    export_embedder,
    export_from_config,
    export_retriever,
    export_retriever_from_config,
    load_embedder,
    load_retriever,
)
from .service import RetrievalService
