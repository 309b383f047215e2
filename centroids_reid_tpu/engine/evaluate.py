"""Validation / test: embedding extraction + centroid eval + metrics.

Mirrors the reference flow (/root/reference/modelling/bases.py:169-318):
``emb = bn(backbone(x))`` per batch, concatenated over query+gallery, then
optionally replaced by per-pid centroids, then R1/mAP. The reference runs
eval on rank 0 only; here extraction is a jitted static-shape program and
the ranking runs sharded/chunked on device, so there is no reason to idle —
but the semantics (full val set, one evaluator) are identical.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalLoader, normalize_batch
from ..data.transforms import normalize_yuv420_batch
from ..data.loader import ImageStore
from ..metrics import K_LIST, R1mAP, build_centroid_eval_set
from ..metrics.eval_reid import ReidMetrics


def _shared_store(dataset, cfg) -> ImageStore:
    """One decoded-image cache per dataset object: repeated validations
    (EVAL_PERIOD, final double test) skip re-decoding the val set."""
    size = tuple(cfg.INPUT.SIZE_TEST)
    store = getattr(dataset, "_eval_store", None)
    if store is None or store.size_hw != size:
        store = ImageStore(size, cfg.TPU.CACHE_IMAGES)
        dataset._eval_store = store
    return store


# Factories are memoized per (model, preprocessing) so repeated validations
# reuse the same jitted wrapper (a fresh jax.jit per call would retrace and
# recompile every eval).
_FN_CACHE: dict = {}


def _cache_key(kind, model, cfg):
    # linen modules are frozen dataclasses -> hashable by field values, so
    # structurally identical models share the compiled function
    return (
        kind,
        model,
        tuple(cfg.INPUT.PIXEL_MEAN),
        tuple(cfg.INPUT.PIXEL_STD),
        bool(cfg.USE_MIXED_PRECISION),
    )


def make_embed_fn(model, cfg, input_format: str = "rgb"):
    """``input_format="rgb"``: uint8 [B,H,W,3] (bit-exact parity path).
    ``"yuv420"``: packed planar uint8 [B, 1.5*H*W] from the serving
    fast-ingest path (TPU.FAST_DECODE) — the unpack + colour conversion
    runs inside this jitted program so the wire carries half the bytes.
    The yuv closure bakes in SIZE_TEST (the packed layout is
    size-dependent), so the size joins the memo key."""
    key = _cache_key("embed", model, cfg) + (
        input_format, tuple(cfg.INPUT.SIZE_TEST),
    )
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    mean = tuple(cfg.INPUT.PIXEL_MEAN)
    std = tuple(cfg.INPUT.PIXEL_STD)
    size_hw = tuple(cfg.INPUT.SIZE_TEST)
    dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32

    @jax.jit
    def embed(params_model, batch_stats, imgs_u8):
        if input_format == "yuv420":
            x = normalize_yuv420_batch(
                imgs_u8, size_hw, mean, std, dtype=dtype
            )
        else:
            x = normalize_batch(imgs_u8, mean, std, dtype=dtype)
        e = model.apply(
            {"params": params_model, "batch_stats": batch_stats},
            x,
            method=model.embed,
        )
        if input_format == "yuv420":
            # serving fast path: fetch bf16 (half the device->host bytes
            # on the link that bounds the e2e pipeline); the caller
            # widens back to fp32 on host. The parity path stays fp32.
            e = e.astype(jnp.bfloat16)
        return e

    _FN_CACHE[key] = embed
    return embed


def make_embed_many_fn(model, cfg):
    """Scanned variant: embeds [S, B, H, W, 3] in ONE dispatch.

    The device tunnel has tens of ms of fixed latency per dispatched
    computation; scanning S loader batches per call amortises it S-fold
    during validation."""
    key = _cache_key("embed_many", model, cfg)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    mean = tuple(cfg.INPUT.PIXEL_MEAN)
    std = tuple(cfg.INPUT.PIXEL_STD)
    dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32

    @jax.jit
    def embed_many(params_model, batch_stats, imgs_u8):
        def body(_, x_u8):
            x = normalize_batch(x_u8, mean, std, dtype=dtype)
            e = model.apply(
                {"params": params_model, "batch_stats": batch_stats},
                x,
                method=model.embed,
            )
            return None, e

        _, es = jax.lax.scan(body, None, imgs_u8)
        return es  # [S, B, D]

    _FN_CACHE[key] = embed_many
    return embed_many


_EVAL_SCAN_BATCHES = 8


def _maybe_int8_eval_fn(cfg, model, params_model, batch_stats, records,
                        store):
    """Deployment-accuracy evaluation: when ``TPU.INT8_EVAL`` is set AND
    this is an ONLY_TEST run, embeddings come from the int8 PTQ serving
    path (models/quantized.py), so the reported mAP/CMC measure the
    *deployed* quantized model. Training-loop validation always stays
    bf16/fp32 (per-epoch recalibration would be both slow and a moving
    metric)."""
    if not (cfg.TPU.INT8_EVAL and cfg.TEST.ONLY_TEST):
        return None
    from ..models.quantized import quantize_for_serving

    # shared flow: honours TPU.INT8_CACHE_PATH, so the evaluated model IS
    # the saved serving artifact when one is configured
    qfn = quantize_for_serving(
        cfg, model, params_model, batch_stats, records, store=store
    )
    print("Evaluation uses the int8 serving path (TPU.INT8_EVAL)")
    return lambda _p, _bs, imgs_sb: qfn.embed_many(imgs_sb)


def extract_embeddings(
    model, cfg, params_model, batch_stats, loader: EvalLoader,
    embed_many_fn=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (embeddings [N,D] fp32, pids [N], camids [N])."""
    embed_many = embed_many_fn or make_embed_many_fn(model, cfg)
    embs, pids, camids = [], [], []
    chunk: list = []

    def flush():
        if not chunk:
            return
        s = len(chunk)
        imgs = np.stack([b["images"] for b in chunk])
        if s < _EVAL_SCAN_BATCHES:  # pad to the static scan length
            imgs = np.concatenate(
                [imgs, np.zeros((_EVAL_SCAN_BATCHES - s,) + imgs.shape[1:],
                                imgs.dtype)]
            )
        es = np.asarray(embed_many(params_model, batch_stats, imgs))
        for i, b in enumerate(chunk):
            v = b["valid"]
            embs.append(es[i][v])
            pids.append(b["pids"][v])
            camids.append(b["camids"][v])
        chunk.clear()

    for batch in loader:
        chunk.append(batch)
        if len(chunk) == _EVAL_SCAN_BATCHES:
            flush()
    flush()
    return (
        np.concatenate(embs, axis=0),
        np.concatenate(pids, axis=0),
        np.concatenate(camids, axis=0),
    )


def balanced_slice(n: int, n_proc: int, rank: int) -> Tuple[int, int]:
    """Contiguous balanced [lo, hi) split of n rows over n_proc ranks:
    sizes differ by at most one and every rank is non-empty when
    n >= n_proc (the ceil-chunk split both are NOT true of)."""
    return rank * n // n_proc, (rank + 1) * n // n_proc


def extract_embeddings_sharded(
    model, cfg, params_model, batch_stats, records, store,
    embed_many_fn=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Multi-host extraction: each process embeds a CONTIGUOUS slice of the
    records, then embeddings/pids/camids are allgathered and reassembled in
    order — every process ends with the identical full set.

    Replaces both the reference's rank-0-only eval (other ranks idle at a
    barrier, modelling/bases.py:169,299-318) and round 2's redundant
    identical per-process validation: per-process extraction work drops to
    1/process_count of the val set. Contiguous slicing keeps the gathered
    concatenation in original record order (num_query split intact)."""
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    rank = jax.process_index()
    n = len(records)
    # BALANCED contiguous split (rank*n//p slicing): every rank gets a
    # non-empty slice whenever n >= n_proc (caller-checked). The previous
    # ceil-chunk split handed trailing ranks an EMPTY slice for many
    # (n, p) — e.g. n=9, p=8 — which crashed that rank in concatenate
    # while its peers hung in the allgather.
    per = -(-n // n_proc)  # max rows per rank = the uniform gather width
    lo, hi = balanced_slice(n, n_proc, rank)
    loader = EvalLoader(records[lo:hi], cfg, store=store)
    emb, pids, camids = extract_embeddings(
        model, cfg, params_model, batch_stats, loader,
        embed_many_fn=embed_many_fn,
    )
    pad = per - emb.shape[0]
    valid = np.ones(per, bool)
    if pad:
        valid[per - pad:] = False
        emb = np.concatenate(
            [emb, np.zeros((pad, emb.shape[1]), emb.dtype)]
        )
        pids = np.concatenate([pids, np.zeros(pad, pids.dtype)])
        camids = np.concatenate([camids, np.zeros(pad, camids.dtype)])
    g_emb, g_pids, g_camids, g_valid = multihost_utils.process_allgather(
        (emb, pids.astype(np.int64), camids.astype(np.int64), valid)
    )
    g_emb = np.asarray(g_emb).reshape(n_proc * per, -1)
    mask = np.asarray(g_valid).reshape(-1)
    return (
        g_emb[mask],
        np.asarray(g_pids).reshape(-1)[mask],
        np.asarray(g_camids).reshape(-1)[mask],
    )


def _centroid_gallery_rows(g_pids, g_camids, q_pids, q_camids,
                           respect_camids: bool) -> int:
    """EXACT number of gallery rows the centroid eval set will contain,
    by running the REAL construction (metrics/centroids.py) on dummy
    1-wide embeddings — its row count depends only on pids/camids, never
    on embedding values, so this costs ~nothing and can never drift from
    the construction it predicts (re-implementing the camera-combination
    dedup here would be a second copy of the reference semantics)."""
    from ..metrics.centroids import build_centroid_eval_set

    nq = len(np.asarray(q_pids))
    pids = np.concatenate([np.asarray(q_pids), np.asarray(g_pids)])
    camids = np.concatenate([np.asarray(q_camids), np.asarray(g_camids)])
    emb = np.zeros((len(pids), 1), np.float32)
    cent = build_centroid_eval_set(
        emb, pids, camids, num_query=nq, respect_camids=respect_camids,
    )
    return int(len(cent.labels) - nq)


def validate_rerank_config(cfg, dataset) -> None:
    """Fail-fast validation of the TPU.RERANK x eval-set-size combination
    at startup — a training run with full re-ranking and a streaming-scale
    val set must not die hours in at its first EVAL_PERIOD evaluation
    (the O(N^2) guard otherwise only fires inside R1mAP.compute).

    Checks every eval mode the run will perform (training's final double
    test and ONLY_TEST both evaluate with AND without centroids) against
    ops.rerank's memory guard, using the EXACT eval-set sizes derivable
    from the dataset's ids. Raises ValueError with the fix (set
    TPU.RERANK_WINDOW for any-scale windowed re-ranking) instead of
    letting the run proceed."""
    if not cfg.TPU.RERANK:
        return
    if int(cfg.TPU.RERANK_WINDOW) > 0:
        if cfg.TEST.VISUALIZE == "yes":
            raise ValueError(
                "TEST.VISUALIZE needs the materialised distance matrix, "
                "but windowed re-ranking (TPU.RERANK_WINDOW > 0) "
                "evaluates on the streaming path — drop one of the two "
                "settings"
            )
        return
    from ..ops.rerank import DEFAULT_MAX_N

    nq = dataset.num_query
    val = dataset.val
    g_pids = np.asarray([r.pid for r in val[nq:]])
    g_camids = np.asarray([r.camid for r in val[nq:]])
    q_pids = np.asarray([r.pid for r in val[:nq]])
    q_camids = np.asarray([r.camid for r in val[:nq]])
    sizes = {"plain": nq + len(g_pids)}
    respect = bool(cfg.MODEL.KEEP_CAMID_CENTROIDS)
    sizes["centroids"] = nq + _centroid_gallery_rows(
        g_pids, g_camids, q_pids, q_camids, respect
    )
    over = {m: n for m, n in sizes.items() if n > DEFAULT_MAX_N}
    if over:
        detail = ", ".join(f"{m} eval N={n}" for m, n in over.items())
        raise ValueError(
            f"TPU.RERANK (full k-reciprocal re-ranking) holds two [N, N] "
            f"fp32 matrices in HBM and refuses N > {DEFAULT_MAX_N}; this "
            f"run would evaluate {detail}. Set TPU.RERANK_WINDOW (e.g. "
            f"500) for windowed re-ranking at any gallery scale, or "
            f"disable TPU.RERANK."
        )


def compute_reid_metrics(
    cfg, embeddings, pids, camids, num_query: int, use_centroids: bool,
    return_evaluator: bool = False, streaming: bool = None,
):
    """get_val_metrics equivalent (bases.py:264-297 + 307-314).

    ``streaming``: forwarded to R1mAP — None auto-switches to the
    streaming evaluator past the HBM-safe cell count; callers that need
    ``evaluator.last_distmat`` afterwards (rank visualisation) must pass
    False, since the streaming path never materialises the matrix."""
    respect = bool(cfg.MODEL.KEEP_CAMID_CENTROIDS and use_centroids)
    if use_centroids:
        print("Evaluation is done using centroids")
        es = build_centroid_eval_set(
            embeddings, pids, camids, num_query, respect
        )
        embeddings, pids, camids = es.embeddings, es.labels, es.camids
    if cfg.TPU.RERANK and cfg.TPU.RERANK_WINDOW > 0:
        # windowed re-ranked evaluation (streaming rank path, any scale)
        print("Windowed re-ranking with k-reciprocal encoding (r={}, "
              "k1={}, k2={}, lambda={})".format(
                  cfg.TPU.RERANK_WINDOW, cfg.TPU.RERANK_K1,
                  cfg.TPU.RERANK_K2, cfg.TPU.RERANK_LAMBDA))
    elif cfg.TPU.RERANK:
        # full k-reciprocal re-ranking (ops/rerank.py, beyond-parity):
        # pins the materialising path — R1mAP raises past the O(N^2)
        # memory guard instead of silently degrading to un-reranked
        # streaming metrics (validate_rerank_config catches that at
        # startup)
        print("Re-ranking with k-reciprocal encoding (k1={}, k2={}, "
              "lambda={})".format(cfg.TPU.RERANK_K1, cfg.TPU.RERANK_K2,
                                  cfg.TPU.RERANK_LAMBDA))
        streaming = False
    evaluator = R1mAP(
        num_query=num_query,
        feat_norm=cfg.TEST.FEAT_NORM,
        dist_name=cfg.SOLVER.DISTANCE_FUNC,
        streaming=streaming,
        rerank=bool(cfg.TPU.RERANK),
        rerank_k1=int(cfg.TPU.RERANK_K1),
        rerank_k2=int(cfg.TPU.RERANK_K2),
        rerank_lambda=float(cfg.TPU.RERANK_LAMBDA),
        rerank_window=int(cfg.TPU.RERANK_WINDOW),
    )
    metrics = evaluator.compute(
        embeddings, pids, camids, respect_camids=respect
    )
    if return_evaluator:
        return metrics, evaluator
    return metrics


def evaluate_on_train(
    cfg, model, params_model, batch_stats, dataset, use_centroids: bool = True
) -> Dict[str, float]:
    """Train-set retrieval diagnostic ("Train mAP").

    The reference's ``eval_on_train`` (modelling/bases.py:320-357) is dead
    code — it calls ``R1_mAP(self.hparams.num_query)`` with the wrong
    signature (bases.py:342, noted in SURVEY.md §7) and skips the BNNeck.
    This is the working equivalent: every train image queries the train set
    (as raw images, or per-pid centroids when ``use_centroids``), with the
    usual same-pid+camid removal.
    """
    loader = EvalLoader(dataset.train, cfg, store=_shared_store(dataset, cfg))
    emb, pids, camids = extract_embeddings(
        model, cfg, params_model, batch_stats, loader
    )
    embeddings = np.concatenate([emb, emb], axis=0)
    pids2 = np.concatenate([pids, pids])
    camids2 = np.concatenate([camids, camids])
    m = compute_reid_metrics(
        cfg, embeddings, pids2, camids2, len(emb), use_centroids
    )
    log = {"Train mAP": m.mAP}
    for val, kk in zip(m.all_topk, K_LIST):
        print("Train top-k, Rank-{:<3}:{:.1%}".format(kk, float(val)))
        log[f"Train Top-{kk}"] = float(val)
    print(f"Train mAP: {m.mAP}")
    return log


def run_validation(
    cfg, model, params_model, batch_stats, dataset, use_centroids: bool
) -> Dict[str, float]:
    """Full validation pass; returns {'mAP': ..., 'Top-1': ..., ...}."""
    store = _shared_store(dataset, cfg)
    # int8 deployment-accuracy eval (ONLY_TEST + TPU.INT8_EVAL); one
    # quantization per dataset object covers the double eval
    # cache key includes everything the quantized fn depends on: the
    # checkpoint identity, the ENABLE gate itself (a later eval with
    # INT8_EVAL flipped off must not reuse the cached quantized fn), and
    # the calibration knobs / normalisation constants (mirrors the .npz
    # artifact identity dict in models/quantized.py)
    int8_key = (
        bool(cfg.TPU.INT8_EVAL and cfg.TEST.ONLY_TEST),
        str(cfg.MODEL.PRETRAIN_PATH), str(cfg.TPU.INT8_CACHE_PATH),
        int(cfg.TPU.INT8_CALIB_BATCHES), float(cfg.TPU.INT8_CALIB_PCT),
        tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD),
    )
    int8_fn = None
    if getattr(dataset, "_int8_eval_key", None) == int8_key:
        int8_fn = getattr(dataset, "_int8_eval_fn", None)
    if int8_fn is None:
        int8_fn = _maybe_int8_eval_fn(
            cfg, model, params_model, batch_stats, dataset.val, store
        )
        if int8_fn is not None:
            dataset._int8_eval_fn = int8_fn
            dataset._int8_eval_key = int8_key
    if jax.process_count() > 1 and len(dataset.val) >= jax.process_count():
        emb, pids, camids = extract_embeddings_sharded(
            model, cfg, params_model, batch_stats, dataset.val, store,
            embed_many_fn=int8_fn,
        )
    else:
        emb, pids, camids = extract_embeddings(
            model, cfg, params_model, batch_stats,
            EvalLoader(dataset.val, cfg, store=store),
            embed_many_fn=int8_fn,
        )
    # rank visualisation reads evaluator.last_distmat, which the streaming
    # evaluator never materialises — pin the materialising path when the
    # user asked for visuals (visualisation-scale evals fit HBM; a truly
    # streaming-scale eval cannot be visualised per-query anyway)
    m, evaluator = compute_reid_metrics(
        cfg, emb, pids, camids, dataset.num_query, use_centroids,
        return_evaluator=True,
        streaming=False if cfg.TEST.VISUALIZE == "yes" else None,
    )

    if cfg.TEST.VISUALIZE == "yes":
        import os

        from ..metrics.visrank import visualize_ranked_results

        print("Start visualization...")
        visualize_ranked_results(
            evaluator.last_distmat,
            dataset.query,
            dataset.gallery,
            save_dir=os.path.join(cfg.OUTPUT_DIR or ".", "visrank"),
            width=cfg.INPUT.SIZE_TEST[1],
            height=cfg.INPUT.SIZE_TEST[0],
            topk=cfg.TEST.VISUALIZE_TOPK,
            use_centroids=use_centroids,
            respect_camids=bool(
                cfg.MODEL.KEEP_CAMID_CENTROIDS and use_centroids
            ),
            max_number=cfg.TEST.VISUALIZE_MAX_NUMBER,
        )
    log = {"mAP": m.mAP}
    for val, kk in zip(m.all_topk, K_LIST):
        print("top-k, Rank-{:<3}:{:.1%}".format(kk, float(val)))
        log[f"Top-{kk}"] = float(val)
    print(f"mAP: {m.mAP}")
    return log
