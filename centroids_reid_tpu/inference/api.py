"""Programmatic offline-inference API used by the CLIs.

Flow parity: /root/reference/inference/create_embeddings.py (gallery index
build) and get_similar.py (top-k retrieval with identical .npy outputs).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

import numpy as np

from ..metrics.r1_map import compute_distmat, l2_normalize_rows
from ..models import create_model, init_model
from ..models.convert import graft, load_reference_checkpoint
from .utils import (
    PID_EXTRACTORS,
    calculate_centroids,
    create_pid_path_index,
    list_images_flat,
    list_images_subfolders,
    run_inference,
)

log = logging.getLogger(__name__)


def load_inference_model(cfg):
    """Build an inference model (no classifier) from MODEL.PRETRAIN_PATH —
    accepts orbax dirs or reference torch checkpoints."""
    import jax

    model = create_model(cfg, num_classes=0)
    h, w = cfg.INPUT.SIZE_TEST
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (h, w))
    path = cfg.MODEL.PRETRAIN_PATH
    if not path:
        raise ValueError("MODEL.PRETRAIN_PATH must point to a checkpoint")
    if os.path.isdir(path):
        # orbax checkpoint of a full TrainState: pull the model subtree.
        # Restore array leaves to HOST numpy (metadata pass first — the
        # tree structure isn't known here): a bare restore() materialises
        # every array on device honouring saved shardings, which through
        # the axon tunnel costs a round-trip PER ARRAY — measured 239 s
        # for a resnet18 TrainState vs ~2 s to host. The first jitted
        # dispatch transfers the whole tree in one batch anyway, and host
        # restore is also what makes cross-topology loads work
        # (engine/checkpoint.restore_state does the same for resume).
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        abspath = os.path.abspath(path)
        # .item_metadata.tree: the checkpoint's structure as a PLAIN dict
        # (item_metadata itself is a custom pytree node orbax's own
        # tree-zip over restore_args rejects)
        meta_tree = ckptr.metadata(abspath).item_metadata.tree
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray)
            if hasattr(m, "shape") else ocp.RestoreArgs(),
            meta_tree,
        )
        raw = ckptr.restore(abspath, restore_args=restore_args)
        full = raw["params"]["model"]
        stats = raw["batch_stats"]
        keep = {k: v for k, v in full.items() if k != "fc_query"}
        params = graft(params, keep)
        batch_stats = graft(batch_stats, stats)
    else:
        converted = load_reference_checkpoint(path)
        keep = {
            k: v for k, v in converted["params"].items() if k != "fc_query"
        }
        params = graft(params, keep)
        batch_stats = graft(batch_stats, converted["batch_stats"])
    return model, params, batch_stats


def _shared_store(cfg):
    """One decoded-image store per CLI run, shared between the int8
    calibration pass and the main embedding loop (when CACHE_IMAGES is
    off, the leading calibration images decode twice — honouring the
    memory preference). Format follows the serving ingest decision
    (TPU.FAST_DECODE -> packed YUV420; int8 keeps RGB)."""
    from ..data.loader import ImageStore
    from .utils import serving_ingest_format

    return ImageStore(
        tuple(cfg.INPUT.SIZE_TEST), cfg.TPU.CACHE_IMAGES,
        fmt=serving_ingest_format(cfg),
    )


def maybe_int8_embed_fn(cfg, model, params, batch_stats, paths, store=None):
    """When TPU.INT8_EVAL: build the int8 serving embed fn via the shared
    cfg-driven flow (models/quantized.quantize_for_serving — cache
    load/validate or self-calibration on the leading input batches).
    Returns None when disabled. Pass the same ``store`` the subsequent
    run_inference uses so calibration images are decoded once."""
    if not cfg.TPU.INT8_EVAL:
        return None
    from ..data.datasets import Record
    from ..models.quantized import quantize_for_serving

    records = [Record(p, 0, 0, i) for i, p in enumerate(paths)]
    qfn = quantize_for_serving(
        cfg, model, params, batch_stats, records, store=store
    )
    return lambda _p, _bs, imgs_u8: qfn(imgs_u8)


def build_embeddings(cfg, images_in_subfolders: bool, print_freq: int = 10,
                     pid_from: str = "parent_dir"):
    """create_embeddings flow; saves embeddings.npy + paths.npy."""
    lister = (
        list_images_subfolders if images_in_subfolders else list_images_flat
    )
    paths = lister(cfg.DATASETS.ROOT_DIR)
    if not paths:
        raise RuntimeError("Length of dataloader = 0")

    model, params, batch_stats = load_inference_model(cfg)
    log.info("Running inference")
    store = _shared_store(cfg)
    embeddings, paths = run_inference(
        model, cfg, params, batch_stats, paths, print_freq,
        embed_fn=maybe_int8_embed_fn(
            cfg, model, params, batch_stats, paths, store=store
        ),
        store=store,
    )

    if cfg.MODEL.USE_CENTROIDS:
        log.info("Creating centroids")
        index = create_pid_path_index(paths, PID_EXTRACTORS[pid_from])
        embeddings, paths = calculate_centroids(embeddings, index)

    save_dir = Path(cfg.OUTPUT_DIR)
    save_dir.mkdir(exist_ok=True, parents=True)
    log.info(f"Saving embeddings and index to {save_dir}")
    np.save(save_dir / "embeddings.npy", embeddings)
    np.save(save_dir / "paths.npy", paths)
    return embeddings, paths


def find_similar(cfg, gallery_data: str, images_in_subfolders: bool,
                 normalize_features: bool, topk: int, print_freq: int = 10,
                 use_pallas: Optional[bool] = None):
    """get_similar flow; saves results.npy / query_embeddings.npy /
    query_paths.npy with the reference's dict schema."""
    lister = (
        list_images_subfolders if images_in_subfolders else list_images_flat
    )
    paths = lister(cfg.DATASETS.ROOT_DIR)
    model, params, batch_stats = load_inference_model(cfg)
    log.info("Running inference")
    store = _shared_store(cfg)
    embeddings, paths = run_inference(
        model, cfg, params, batch_stats, paths, print_freq,
        embed_fn=maybe_int8_embed_fn(
            cfg, model, params, batch_stats, paths, store=store
        ),
        store=store,
    )

    load_path = Path(gallery_data)
    embeddings_gallery = np.load(
        load_path / "embeddings.npy", allow_pickle=True
    )
    paths_gallery = np.load(load_path / "paths.npy", allow_pickle=True)

    if normalize_features:
        embeddings_gallery = l2_normalize_rows(embeddings_gallery)
        embeddings = l2_normalize_rows(embeddings)

    log.info("Calculating distance and getting the most similar ids per query")
    if use_pallas is None:
        use_pallas = cfg.TPU.USE_PALLAS_RETRIEVAL
    k = topk if topk else len(paths_gallery)
    if cfg.TPU.RERANK and topk and cfg.TPU.RERANK_WINDOW > 0:
        # windowed re-ranking (ops/rerank.py::rerank_topk): fused top-k
        # retrieval narrows each query to TPU.RERANK_WINDOW candidates,
        # then each query is re-ranked against its own candidate set —
        # O(r^2) transient, so any gallery size the retrieval kernel
        # handles works here (unlike the full re-ranker's ~26k guard)
        from ..ops import rerank_topk

        r = max(int(cfg.TPU.RERANK_WINDOW), topk)
        log.info(
            "Windowed re-ranking with k-reciprocal encoding (r=%d, "
            "k1=%d, k2=%d, lambda=%.2f)", r, cfg.TPU.RERANK_K1,
            cfg.TPU.RERANK_K2, cfg.TPU.RERANK_LAMBDA,
        )
        dists, inds = rerank_topk(
            embeddings, embeddings_gallery, r=r,
            k1=int(cfg.TPU.RERANK_K1), k2=int(cfg.TPU.RERANK_K2),
            lambda_value=float(cfg.TPU.RERANK_LAMBDA),
            dist=cfg.SOLVER.DISTANCE_FUNC, use_pallas=use_pallas,
        )
        dists = np.asarray(dists)[:, :topk]
        inds = np.asarray(inds)[:, :topk]
        out = {
            qp: {
                "indices": inds[i],
                "paths": paths_gallery[inds[i]],
                "distances": dists[i],
            }
            for i, qp in enumerate(paths)
        }
        _save_results(cfg, out, embeddings, paths)
        return out
    if cfg.TPU.RERANK:
        # k-reciprocal re-ranking (ops/rerank.py, beyond-parity feature):
        # the final ranking needs the full re-ranked [Q, G] matrix, so it
        # supersedes the fused/sharded top-k fast paths; the module's
        # O(N^2) guard raises past ~26k total rows
        from ..ops import rerank_distmat

        log.info(
            "Re-ranking with k-reciprocal encoding (k1=%d, k2=%d, "
            "lambda=%.2f)", cfg.TPU.RERANK_K1, cfg.TPU.RERANK_K2,
            cfg.TPU.RERANK_LAMBDA,
        )
        distmat = np.asarray(rerank_distmat(
            embeddings, embeddings_gallery,
            k1=int(cfg.TPU.RERANK_K1), k2=int(cfg.TPU.RERANK_K2),
            lambda_value=float(cfg.TPU.RERANK_LAMBDA),
            dist=cfg.SOLVER.DISTANCE_FUNC,
        ))
        indices = np.argsort(distmat, axis=1, kind="stable")
        indices = indices[:, :topk] if topk else indices
        out = {
            qp: {
                "indices": indices[i],
                "paths": paths_gallery[indices[i]],
                "distances": distmat[i, indices[i]],
            }
            for i, qp in enumerate(paths)
        }
        _save_results(cfg, out, embeddings, paths)
        return out
    if cfg.TPU.SHARDED_RETRIEVAL and not topk:
        # --topk 0 asks for ALL gallery entries ranked per query — that
        # IS the full [Q, G] matrix, which no sharded top-k can avoid;
        # the flag's OOM protection does not apply here and falling
        # through must not be silent
        log.warning(
            "TPU.SHARDED_RETRIEVAL requires --topk > 0 (ranking ALL "
            "gallery entries materialises the full distance matrix on "
            "one device); proceeding with the materialising path"
        )
    if cfg.TPU.SHARDED_RETRIEVAL and topk:
        # gallery sharded over all local devices: capacity = aggregate
        # HBM; identical results to the single-chip path (tests)
        import jax

        if jax.device_count() < 2:
            log.warning(
                "TPU.SHARDED_RETRIEVAL needs >= 2 devices; using one"
            )
        from ..parallel.mesh import make_retrieval_mesh
        from ..parallel.retrieval import sharded_topk

        dists, indices = sharded_topk(
            embeddings, embeddings_gallery, k,
            make_retrieval_mesh(), dist=cfg.SOLVER.DISTANCE_FUNC,
        )
        out = {
            qp: {
                "indices": indices[i],
                "paths": paths_gallery[indices[i]],
                "distances": dists[i],
            }
            for i, qp in enumerate(paths)
        }
    elif use_pallas and topk:
        from ..ops import topk_retrieval

        dists, indices = topk_retrieval(
            embeddings, embeddings_gallery, k, dist=cfg.SOLVER.DISTANCE_FUNC
        )
        out = {
            qp: {
                "indices": indices[i],
                "paths": paths_gallery[indices[i]],
                "distances": dists[i],
            }
            for i, qp in enumerate(paths)
        }
    else:
        distmat = compute_distmat(
            embeddings, embeddings_gallery, cfg.SOLVER.DISTANCE_FUNC
        )
        indices = np.argsort(distmat, axis=1)
        indices = indices[:, :topk] if topk else indices
        out = {
            qp: {
                "indices": indices[i],
                "paths": paths_gallery[indices[i]],
                "distances": distmat[i, indices[i]],
            }
            for i, qp in enumerate(paths)
        }

    _save_results(cfg, out, embeddings, paths)
    return out


def _save_results(cfg, out, embeddings, paths):
    save_dir = Path(cfg.OUTPUT_DIR)
    save_dir.mkdir(exist_ok=True, parents=True)
    log.info(f"Saving results to {save_dir}")
    np.save(save_dir / "results.npy", out)
    np.save(save_dir / "query_embeddings.npy", embeddings)
    np.save(save_dir / "query_paths.npy", paths)
