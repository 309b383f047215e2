"""Offline-inference helpers: folder scanning, batched embedding, centroids.

Mirrors /root/reference/inference/inference_utils.py: flat-folder and
subfolder image listings, ``bn(backbone(x))`` embeddings
(:104-113), pid->paths index via a configurable extractor (:134-144), and
group-mean centroid index construction (:147-159). Compute is a jitted
static-batch program; the tail batch is padded and masked.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Callable, Dict, List, Tuple

import numpy as np

from ..data.loader import EvalLoader, ImageStore
from ..data.datasets import Record
from ..engine.evaluate import make_embed_fn


def serving_ingest_format(cfg) -> str:
    """'yuv420' when the fast serving ingest (TPU.FAST_DECODE) is enabled
    and usable, else 'rgb'. The fast path ships planar YUV420 (half the
    host->device bytes; DCT-scaled decode for large sources) and unpacks
    on device — a documented serving-only divergence from the bit-exact
    eval path (see native/decode.cpp::crt_decode_fast). int8 serving
    keeps 'rgb': its quantized prologue consumes uint8 RGB directly."""
    if not cfg.TPU.FAST_DECODE:
        return "rgb"
    if cfg.TPU.INT8_EVAL:
        log.info("TPU.FAST_DECODE skipped: int8 serving consumes RGB")
        return "rgb"
    from ..native import fast_available

    size = tuple(cfg.INPUT.SIZE_TEST)
    if not fast_available(size):
        log.warning(
            f"TPU.FAST_DECODE unavailable for SIZE_TEST={size} "
            "(odd dims or native decoder missing); using the exact path"
        )
        return "rgb"
    return "yuv420"

log = logging.getLogger(__name__)

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
)


def is_image_file(name: str) -> bool:
    return name.lower().endswith(IMG_EXTENSIONS)


def list_images_flat(path: str) -> List[str]:
    """Images directly under ``path`` (inference_utils.py:37-48)."""
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if is_image_file(f)
        ]
    if is_image_file(path):
        return [path]
    raise RuntimeError(
        f"{path} is neither a valid image file nor a folder containing images"
    )


def list_images_subfolders(path: str) -> List[str]:
    """Images under class subfolders, ImageFolder-style ordering."""
    out = []
    for cls in sorted(os.listdir(path)):
        sub = os.path.join(path, cls)
        if not os.path.isdir(sub):
            continue
        out.extend(
            os.path.join(sub, f)
            for f in sorted(os.listdir(sub))
            if is_image_file(f)
        )
    if not out:
        raise RuntimeError(f"no images found under subfolders of {path}")
    return out


# pid extractors (create_embeddings.py:29-34)
def pid_from_filename(path: str) -> str:
    """/dir/product001_04.jpg -> product001"""
    return os.path.basename(path).rsplit(".", 1)[0].rsplit("_", 1)[0]


def pid_from_parent_dir(path: str) -> str:
    """/root/001/image_04.jpg -> 001"""
    return Path(path).parent.name


PID_EXTRACTORS: Dict[str, Callable[[str], str]] = {
    "parent_dir": pid_from_parent_dir,
    "filename": pid_from_filename,
}


def run_inference(
    model, cfg, params_model, batch_stats, image_paths: List[str],
    print_freq: int = 10, embed_fn=None, store=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Embed a list of images; returns (embeddings [N,D] fp32, paths [N]).

    ``embed_fn(params, batch_stats, imgs_u8)`` overrides the default
    bf16/fp32 embed program (used by the int8 serving path); ``store``
    shares a decoded-image cache with e.g. the calibration pass. With
    ``TPU.FAST_DECODE`` (and no ``embed_fn`` override) batches travel as
    packed YUV420 and the unpack runs inside the embed program."""
    if store is None:
        fmt = serving_ingest_format(cfg) if embed_fn is None else "rgb"
        store = ImageStore(
            tuple(cfg.INPUT.SIZE_TEST), cfg.TPU.CACHE_IMAGES, fmt=fmt
        )
    elif store.fmt == "yuv420" and embed_fn is not None:
        raise ValueError(
            "run_inference: a yuv420 store cannot feed a custom embed_fn "
            "(custom fns consume uint8 RGB batches)"
        )
    records = [Record(p, 0, 0, i) for i, p in enumerate(image_paths)]
    loader = EvalLoader(records, cfg, store=store)
    embed = embed_fn or make_embed_fn(model, cfg, input_format=store.fmt)
    embs = []
    # Keep up to two batches in flight: JAX dispatch is async, so deferring
    # the host fetch (np.asarray) overlaps D2H of batch i with H2D+compute
    # of batch i+1 — on top of EvalLoader's threaded decode prefetch. This
    # matters through high-latency device links (each sync is a roundtrip).
    pending: list = []

    def drain_one():
        e, valid = pending.pop(0)
        # astype: the fast serving path returns bf16 (halved D2H bytes);
        # the public contract stays fp32 [N, D]
        embs.append(np.asarray(e)[valid].astype(np.float32, copy=False))

    for pos, batch in enumerate(loader):
        if pos % print_freq == 0:
            log.info(
                f"Number of processed images: {pos * loader.batch_size}"
            )
        pending.append(
            (embed(params_model, batch_stats, batch["images"]),
             batch["valid"])
        )
        if len(pending) > 2:
            drain_one()
    while pending:
        drain_one()
    return np.concatenate(embs, axis=0), np.asarray(image_paths)


def create_pid_path_index(
    paths: List[str], func: Callable[[str], str]
) -> Dict[str, list]:
    index: Dict[str, list] = {}
    for idx, path in enumerate(paths):
        index.setdefault(func(path), []).append(idx)
    return index


def calculate_centroids(
    embeddings: np.ndarray, pid_path_index: Dict[str, list]
) -> Tuple[np.ndarray, np.ndarray]:
    """Group-mean centroids; returns (centroids, pid strings)."""
    pids, cents = [], []
    for pid, indices in pid_path_index.items():
        cents.append(embeddings[np.asarray(indices)].mean(axis=0))
        pids.append(pid)
    return np.vstack(cents), np.asarray(pids, dtype=np.str_)
