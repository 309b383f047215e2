"""Serving: one-dispatch image -> top-k retrieval against a resident gallery.

The reference's serving story is two offline CLIs (embed, then rank). For
production serving the whole query path should be ONE device program: decode
on host, then normalise -> backbone -> BNNeck -> (optional) L2 -> fused
distance+top-k against a gallery that lives in HBM. Nothing besides the
uint8 query batch and the k results crosses the host boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import normalize_batch, normalize_yuv420_batch
from ..ops.retrieval import _G_TILE, _SCORE_BUDGET_BYTES, topk_select
from .api import load_inference_model


def ranked_query(e, gf, gf32, gn, k: int, use_pallas: bool = True):
    """[B, D] embeddings -> exact-fp32-sorted ``(distances [B, k],
    indices [B, k])`` against a resident (padded) gallery.

    The shared ranking half of the one-dispatch query program: pad
    queries to the kernel's 128-row tile, kernel-dtype selection
    (``ops.retrieval.topk_select`` — Pallas on bf16/TPU, exact XLA on
    fp32), then exact fp32 re-score + stable sort of the winners.
    Used inside ``RetrievalService``'s jitted ``run`` AND as
    ``LoadedRetriever``'s live rank stage (inference/export.py), so an
    artifact-served query ranks through the very same program as the
    live service."""
    eq = e.astype(gf.dtype)
    pad_q = (-eq.shape[0]) % 128
    if pad_q:
        eq = jnp.concatenate(
            [eq, jnp.zeros((pad_q, eq.shape[1]), eq.dtype)]
        )
    # ONE selection entry for every k (ops.retrieval.topk_select): bf16
    # galleries rank on the Pallas kernels (streaming merge at k <= 32,
    # score kernel + hierarchical top-k beyond — the reference CLI's
    # canonical depth is k=100,
    # /root/reference/inference/get_similar.py:57), fp32 galleries on
    # the exact XLA score path.
    val, idx = topk_select(eq, gf, gn, k, use_pallas=use_pallas)
    val, idx = val[: e.shape[0]], idx[: e.shape[0]]
    # exact re-score + sort of the winners in fp32 (the astype is a
    # no-op with the fp32 copy; with exact_rescore=False it widens the
    # kernel-dtype rows so arithmetic stays fp32)
    g_sel = jnp.take(gf32, idx, axis=0).astype(jnp.float32)
    e32 = e.astype(jnp.float32)
    d = (
        jnp.sum(e32 * e32, axis=1)[:, None]
        + jnp.sum(g_sel * g_sel, axis=2)
        - 2.0 * jnp.einsum("qd,qkd->qk", e32, g_sel)
    )
    order = jnp.argsort(d, axis=1, stable=True)
    return (
        jnp.take_along_axis(d, order, axis=1),
        jnp.take_along_axis(idx, order, axis=1),
    )


def reranked_query(e, gf, gf32, gn, k: int, r: int, k1: int, k2: int,
                   lam: float, use_pallas: bool = True,
                   dist: str = "euclidean"):
    """``ranked_query`` + windowed k-reciprocal re-ranking of each query's
    top-``r`` candidate window, in the same single device program:
    kernel-dtype selection narrows to ``r`` candidates, then each query is
    re-ranked against its own candidate set (ops/rerank.py::_windowed —
    exactly the math of ``rerank_topk`` over the resident gallery).
    Returns ``(scores [B, k], indices [B, k])`` ascending by the composite
    ``lam * dn + (1 - lam) * jaccard`` re-rank score — the same values the
    ``get_similar --rerank`` windowed CLI path saves (inference/api.py),
    so a served response equals the offline result on the same inputs.

    ``dist`` is the re-rank's LOCAL distance (SOLVER.DISTANCE_FUNC — the
    CLI path's choice, inference/api.py). Candidate SELECTION is always
    the service's euclidean raw score; for ``dist="cosine"`` the caller
    must serve L2-normalized embeddings+gallery (RetrievalService
    enforces it), where euclidean selection is rank-equivalent to cosine
    (``||a-b||^2 = 2|1-cos|``) so the window SET matches the CLI's.

    Used by ``RetrievalService(rerank_window=r)``'s jitted ``run`` AND as
    ``LoadedRetriever``'s rank stage when the artifact is served with
    ``--rerank_window`` (inference/export.py) — one program, both
    serving surfaces."""
    d0, idx0 = ranked_query(e, gf, gf32, gn, r, use_pallas=use_pallas)
    return _rerank_tail(e, gf32, idx0, k, r, k1, k2, lam, dist)


def _rerank_tail(e, gf32, idx0, k: int, r: int, k1: int, k2: int,
                 lam: float, dist: str):
    """Windowed k-reciprocal re-rank of pre-selected candidate windows
    ``idx0 [B, r]`` — the shared back half of ``reranked_query`` and
    ``reranked_query_int8`` (selection differs, the re-rank math must
    not)."""
    from ..ops.rerank import _WIN_CHUNK, _windowed

    # same neighbourhood clamps as ops.rerank.rerank_topk: the per-set
    # rank matrix has r+1 rows, k1+1 columns
    k1c = max(1, min(int(k1), r))
    k2c = max(1, min(int(k2), k1c + 1))
    chunk = max(1, min(_WIN_CHUNK, e.shape[0]))
    vals = _windowed(
        e.astype(jnp.float32), gf32, idx0, float(lam),
        k1c + 1, k1c // 2 + 1, k2c, chunk, dist,
    )
    order = jnp.argsort(vals, axis=1)[:, :k]
    return (
        jnp.take_along_axis(vals, order, axis=1),
        jnp.take_along_axis(idx0, order, axis=1),
    )


def ranked_query_int8(e, gal, gf32, k: int, use_pallas: bool = True,
                      sel: int = 0):
    """``ranked_query`` over an int8-quantized gallery index
    (ops/retrieval_int8.py — beyond parity, FAISS-SQ8-style): int8
    candidate selection at margin ``sel`` (0 -> ``default_margin(k)``, clamped
    by the CALLER to the real row count when ``gal`` is padded) + the
    same exact fp32 re-score as the bf16 path (``gf32=None`` = capacity
    mode: re-score from dequantized codes, no full-precision copy
    resident). With ``gf32`` the returned distances are exact fp32
    squared distances of the returned indices — quantization gates
    candidate recall only. The index's measured value is memory
    (1-byte/elem selection state) and the 1.52x score pass; end-to-end
    latency is selection-bound and stays ~par with bf16 (README
    benchmark notes)."""
    from ..ops.retrieval_int8 import topk_select_int8

    pad_q = (-e.shape[0]) % 128
    eq = e
    if pad_q:
        eq = jnp.concatenate([e, jnp.zeros((pad_q, e.shape[1]), e.dtype)])
    val, idx = topk_select_int8(
        eq, gal, gf32, k, sel=sel, use_pallas=use_pallas
    )
    val, idx = val[: e.shape[0]], idx[: e.shape[0]]
    e32 = e.astype(jnp.float32)
    return val + jnp.sum(e32 * e32, axis=1)[:, None], idx


def reranked_query_int8(e, gal, gf32, k: int, r: int, k1: int, k2: int,
                        lam: float, use_pallas: bool = True,
                        dist: str = "euclidean", sel: int = 0):
    """``reranked_query`` with the int8-selected candidate window: the
    window members come from the quantized index (margin semantics of
    ``ranked_query_int8``), the re-rank itself runs over exact fp32
    rows — identical math to the bf16 path via ``_rerank_tail``."""
    _, idx0 = ranked_query_int8(e, gal, gf32, r, use_pallas=use_pallas,
                                sel=sel)
    return _rerank_tail(e, gf32, idx0, k, r, k1, k2, lam, dist)


def _pad_gallery(gf: np.ndarray, unit: int):
    """Pad gallery rows to a multiple of ``unit``; returns (gf, gn) where
    padded rows are zero vectors with +inf squared norm so they can never
    win selection."""
    g = gf.shape[0]
    gn = (gf * gf).sum(axis=1)
    pad = (-g) % unit
    if pad:
        gf = np.concatenate([gf, np.zeros((pad, gf.shape[1]), gf.dtype)])
        gn = np.concatenate([gn, np.full((pad,), np.inf, np.float32)])
    return gf, gn


class RetrievalService:
    """Holds the model and a device-resident gallery; answers queries.

    gallery_embeddings: [G, D] float array (e.g. loaded from the
    create_embeddings output); gallery_paths: [G] identifiers returned with
    results. ``use_bf16_kernel`` routes ranking through the Pallas kernel
    (selection at bf16 resolution, exact re-scoring of winners).

    ``exact_rescore=False`` drops the resident fp32 gallery copy and
    re-scores winners from the kernel-dtype rows instead — with the bf16
    kernel that is bf16-resolution gallery values in fp32 arithmetic
    (ranking differences only among near-ties). Capacity triples: a
    1M x 2048 gallery costs 4 GB resident instead of 12 GB, ~3M rows fit
    one v5e chip before needing ``mesh``. At k > 32 (or with the fp32
    kernel) selection materialises a per-dispatch [B, G] fp32 score
    matrix, so ``max_query_batch`` is auto-clamped against
    ops.retrieval's score budget — huge galleries just see smaller query
    dispatches, never an OOM.

    ``mesh``: a Mesh with a ``gallery`` axis shards the resident gallery
    rows across its devices (parallel/retrieval.py semantics) — galleries
    bounded by the POD's aggregate HBM, not one chip's. The query program
    stays ONE dispatch: replicated embed, per-shard bf16 selection + local
    exact fp32 re-score, then an all-gather of n_devices*k candidates
    (tiny, rides ICI) and a global exact merge. Results match the
    single-chip path up to bf16 selection resolution on near-ties: both
    select at kernel dtype and re-score winners exactly, but the sharded
    path merges per-shard candidates by exact fp32 distance, so two rows
    whose bf16 scores tie across shards can swap relative to the
    single-chip order (fp32 kernels are bit-identical;
    tests/test_parallel.py asserts identity on its fixtures).
    """

    def __init__(
        self,
        cfg,
        gallery_embeddings: np.ndarray,
        gallery_paths: Sequence,
        k: int = 10,
        normalize: bool = True,
        use_bf16_kernel: bool = True,
        model_bundle=None,
        int8_calib_imgs: Optional[np.ndarray] = None,
        mesh=None,
        max_query_batch: int = 512,
        exact_rescore: bool = True,
        int8_qfn=None,
        use_pallas: bool = True,
        rerank_window: int = 0,
        rerank_k1: int = 20,
        rerank_k2: int = 6,
        rerank_lambda: float = 0.3,
        use_int8_gallery: bool = False,
    ):
        """``int8_calib_imgs``: uint8 [N,H,W,3] sample of the query domain;
        when given, the embed stage runs the int8 PTQ path
        (models/quantized.py) inside the same single-dispatch program.
        ``int8_qfn``: alternatively, a prebuilt QuantizedEmbed (e.g. from
        the cfg-driven ``quantize_for_serving`` flow with its
        INT8_CACHE_PATH artifact reuse) — takes precedence over
        ``int8_calib_imgs``.
        ``use_pallas=False`` pins the pure-XLA selection path (no
        backend-gated Pallas kernels anywhere in the query program) —
        the configuration ``export.export_retriever`` serializes for
        cross-platform artifacts.
        ``rerank_window=r`` (r > 0) re-ranks each query's top-r candidate
        window with k-reciprocal encoding INSIDE the same query program
        (``reranked_query``): returned distances become the composite
        re-rank scores and equal the ``get_similar --rerank`` windowed
        CLI output on the same inputs (inference/api.py). r is clamped
        to [k, gallery]; k1/k2/lambda default to the TPU.RERANK_*
        defaults. On a sharded gallery the candidate rows are assembled
        by a cross-shard psum gather (parallel/retrieval.py), so the
        program stays one dispatch there too.
        ``use_int8_gallery=True`` replaces the kernel-dtype gallery copy
        with a per-row int8 scalar-quantized index
        (ops/retrieval_int8.py). With ``exact_rescore=True`` final
        distances stay exact fp32 (margin-select + re-score over the
        resident fp32 rows) at 5 bytes/elem resident; with
        ``exact_rescore=False`` (CAPACITY mode) the codes are the only
        resident gallery state — 1 byte/elem, ~7M x 2048 rows on a
        16 GB chip — and winners re-score against their own dequantized
        rows (int8-resolution values, fp32 arithmetic; re-ranking is
        unavailable there, it needs the full-precision rows).
        Single-chip serving only (a mesh shards fp32/bf16 rows instead
        — one capacity lever at a time)."""
        self.cfg = cfg
        self.k = int(min(k, len(gallery_paths)))
        self.normalize = normalize
        self.max_query_batch = int(max_query_batch)
        g_total = int(len(gallery_paths))
        self.rerank_window = (
            min(max(int(rerank_window), self.k), g_total)
            if rerank_window and g_total else 0
        )
        self._rerank_params = (
            int(rerank_k1), int(rerank_k2), float(rerank_lambda)
        )
        # the re-rank's LOCAL distance follows the config like the CLI
        # windowed path (inference/api.py passes SOLVER.DISTANCE_FUNC);
        # cosine needs normalized serving so the euclidean candidate
        # selection is rank-equivalent to the CLI's cosine selection
        self._rerank_dist = str(cfg.SOLVER.DISTANCE_FUNC)
        if (self.rerank_window and self._rerank_dist == "cosine"
                and not normalize):
            raise ValueError(
                "rerank_window with SOLVER.DISTANCE_FUNC='cosine' needs "
                "normalize=True (serve.py --normalize_features): on "
                "unnormalized features euclidean candidate selection is "
                "not rank-equivalent to the CLI's cosine selection, so "
                "served results could not equal get_similar --rerank"
            )
        self.paths = np.asarray(gallery_paths)
        if model_bundle is None:
            model_bundle = load_inference_model(cfg)
        self.model, self.params, self.batch_stats = model_bundle
        from ..parallel.mesh import GALLERY_AXIS

        self.mesh = (
            mesh
            if mesh is not None and mesh.shape[GALLERY_AXIS] > 1
            else None
        )
        self.use_int8_gallery = bool(use_int8_gallery)
        if self.use_int8_gallery and self.mesh is not None:
            raise ValueError(
                "use_int8_gallery is the single-chip capacity/latency "
                "lever; a mesh shards fp32/bf16 rows across chips "
                "(parallel/retrieval.py) — use one at a time"
            )
        if (self.use_int8_gallery and not exact_rescore
                and rerank_window):
            raise ValueError(
                "use_int8_gallery + exact_rescore=False (capacity mode: "
                "codes are the ONLY resident gallery state) cannot "
                "re-rank — the windowed k-reciprocal core needs the "
                "full-precision rows; keep exact_rescore=True to combine "
                "int8 selection with re-ranking"
            )

        gf = np.asarray(gallery_embeddings, np.float32)
        if normalize:
            gf = gf / np.maximum(
                np.linalg.norm(gf, axis=1, keepdims=True), 1e-12
            )
        g = gf.shape[0]
        kernel_dtype = jnp.bfloat16 if use_bf16_kernel else jnp.float32
        if self.mesh is not None:
            # shard gallery rows over the mesh's gallery axis; pad rows
            # carry inf norms so they never win selection
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            n_shards = self.mesh.shape[GALLERY_AXIS]
            gf, gn = _pad_gallery(gf, n_shards)
            rows = NamedSharding(self.mesh, P(GALLERY_AXIS))
            self._gf = jax.device_put(jnp.asarray(gf, kernel_dtype), rows)
            self._gf32 = (
                jax.device_put(jnp.asarray(gf, jnp.float32), rows)
                if exact_rescore else self._gf
            )
            self._gn = jax.device_put(
                jnp.asarray(gn, jnp.float32)[None, :],
                NamedSharding(self.mesh, P(None, GALLERY_AXIS)),
            )
            self._shard_rows = gf.shape[0] // n_shards
        elif self.use_int8_gallery:
            from ..ops.retrieval_int8 import Int8Gallery, quantize_gallery

            gf, gn = _pad_gallery(gf, _G_TILE)
            gal = quantize_gallery(gf)  # zero pad rows -> zero codes
            gn_i8 = np.asarray(gal.gn).copy()
            gn_i8[g:] = np.inf         # pads must never win selection
            self._gf = Int8Gallery(
                codes=jax.device_put(gal.codes),
                scale=jax.device_put(gal.scale),
                gn=jax.device_put(jnp.asarray(gn_i8)),
            )
            # capacity mode (exact_rescore=False): the codes are the
            # ONLY resident gallery state — winners re-score against
            # their own dequantized rows (0-row placeholder keeps the
            # run signature uniform; the program never touches it)
            self._gf32 = (
                jax.device_put(jnp.asarray(gf[:g], jnp.float32))
                if exact_rescore
                else jnp.zeros((0, gf.shape[1]), jnp.float32)
            )
            self._gn = jax.device_put(jnp.asarray(gn, jnp.float32)[None, :])
        else:
            gf, gn = _pad_gallery(gf, _G_TILE)
            self._gf = jax.device_put(jnp.asarray(gf, kernel_dtype))
            self._gf32 = (
                jax.device_put(jnp.asarray(gf[:g], jnp.float32))
                if exact_rescore else self._gf
            )
            self._gn = jax.device_put(jnp.asarray(gn, jnp.float32)[None, :])

        # k > 32 (and fp32-kernel) selection materialises a [B, width] fp32
        # score matrix per dispatch (ops.retrieval topk_select dispatch
        # table); clamp the query chunk so that buffer respects the same
        # score budget the CLI path enforces. width = per-shard rows on a
        # mesh (each device scores its shard) — and the sharded program
        # ALWAYS materialises its per-shard scores (shard_select_merge's
        # MXU dot + hierarchical build; the streaming-merge Pallas kernel
        # only serves the single-chip bf16 k<=32 case), so a mesh clamps
        # unconditionally. Floor 128: the Pallas query tile — at the
        # floor a 3M-row gallery costs ~1.5 GB of scores, the irreducible
        # minimum for one dispatch.
        k_sel = self.rerank_window or self.k  # selection depth per query
        # int8 margin (ops/retrieval_int8.py default), clamped to the
        # REAL row count so padded +inf rows never enter the candidate
        # gather against the unpadded fp32 copy
        if self.use_int8_gallery:
            from ..ops.retrieval_int8 import default_margin

            self._int8_sel = min(g, default_margin(k_sel))
        else:
            self._int8_sel = 0
        if (self.mesh is not None or self.use_int8_gallery
                or not (use_bf16_kernel and k_sel <= 32)):
            width = self._shard_rows if self.mesh is not None else gf.shape[0]
            # max(width, 1): an empty gallery (index built before any data
            # arrived) must still construct — its score matrix is 0-wide
            cap = max(
                128,
                (_SCORE_BUDGET_BYTES // (max(width, 1) * 4)) // 128 * 128,
            )
            self.max_query_batch = min(self.max_query_batch, cap)
        if self.rerank_window and self.mesh is not None:
            # the sharded re-rank path materialises the [B, r, D] fp32
            # candidate-row gather (replicated on every chip after the
            # psum) — clamp the query chunk against the same score budget
            cap_rr = max(
                8,
                _SCORE_BUDGET_BYTES
                // (self.rerank_window * max(gf.shape[1], 1) * 4),
            )
            self.max_query_batch = min(self.max_query_batch, cap_rr)

        mean = tuple(cfg.INPUT.PIXEL_MEAN)
        std = tuple(cfg.INPUT.PIXEL_STD)
        emb_dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32
        model = self.model
        k_eff = self.k
        do_norm = normalize

        self._qfn = int8_qfn
        if self._qfn is None and int8_calib_imgs is not None:
            from ..models.quantized import quantize_reid_model

            self._qfn = quantize_reid_model(
                self.model, self.params, self.batch_stats,
                [np.asarray(int8_calib_imgs)], mean, std,
                calib_percentile=cfg.TPU.INT8_CALIB_PCT,
            )
        qfn = self._qfn
        # int8: params/batch_stats slots carry (qtree, None) so the weights
        # stay jit *arguments* (closure capture would bake ~25 MB of int8
        # weights into the executable as constants)
        if qfn is not None:
            self.params, self.batch_stats = qfn.qtree, None

        size_hw = tuple(cfg.INPUT.SIZE_TEST)

        def embed_q(params, batch_stats, imgs_u8):
            if qfn is not None:
                e = qfn.apply(params, imgs_u8)
            else:
                # 2-D input = packed planar YUV420 from the fast serving
                # ingest (TPU.FAST_DECODE; see data/transforms.py) — the
                # unpack fuses into this same single-dispatch program.
                # Rank is static under jit, so both formats share one fn.
                if imgs_u8.ndim == 2:
                    x = normalize_yuv420_batch(
                        imgs_u8, size_hw, mean, std, dtype=emb_dtype
                    )
                else:
                    x = normalize_batch(imgs_u8, mean, std, dtype=emb_dtype)
                e = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, method=model.embed,
                )
            if do_norm:
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
                )
            return e

        rr = self.rerank_window
        rk1, rk2, rlam = self._rerank_params

        int8g = self.use_int8_gallery
        i8sel = self._int8_sel
        i8_exact = bool(exact_rescore)

        @jax.jit
        def run(params, batch_stats, gf, gf32, gn, imgs_u8):
            e = embed_q(params, batch_stats, imgs_u8)
            if int8g:
                # gf carries the Int8Gallery pytree; gn rides unused
                # (the index holds its own dequantized-norm row). In
                # capacity mode gf32 is the 0-row placeholder — pass
                # None so winners re-score from dequantized codes.
                g32 = gf32 if i8_exact else None
                if rr:
                    return reranked_query_int8(
                        e, gf, g32, k_eff, rr, rk1, rk2, rlam,
                        use_pallas=use_pallas, dist=self._rerank_dist,
                        sel=i8sel,
                    )
                return ranked_query_int8(e, gf, g32, k_eff,
                                         use_pallas=use_pallas, sel=i8sel)
            if rr:
                return reranked_query(e, gf, gf32, gn, k_eff, rr,
                                      rk1, rk2, rlam, use_pallas=use_pallas,
                                      dist=self._rerank_dist)
            return ranked_query(e, gf, gf32, gn, k_eff,
                                use_pallas=use_pallas)

        self._run = run
        if self.mesh is not None:
            self._run = self._build_sharded_run(embed_q, kernel_dtype)

    def _build_sharded_run(self, embed_q, kernel_dtype):
        """One-dispatch query program over a gallery sharded on the mesh's
        ``gallery`` axis: replicated embed -> per-shard bf16/fp32 selection
        (ops.retrieval hierarchical build) -> LOCAL exact fp32 re-score of
        each shard's k winners (no cross-chip row gather) -> all-gather of
        the n*k exact candidates (k floats+ints per query per shard — the
        only ICI traffic) -> global top-k + stable sort. Exactness matches
        the single-chip path: every global top-k row is inside its own
        shard's top-k at kernel resolution, and the merge compares exact
        fp32 distances."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import GALLERY_AXIS, shard_map
        from ..parallel.retrieval import (
            make_sharded_row_gather,
            shard_select_merge,
        )

        mesh = self.mesh
        # with re-ranking the selection stage widens to the candidate
        # window; the final k columns are taken after the re-rank sort
        k_eff = self.rerank_window or self.k
        shard_rows = self._shard_rows

        def local(e_k, e32, gf_l, gf32_l, gn_l):
            def rescore(val, idx):
                # exact fp32 re-score of the shard's winners against its
                # LOCAL fp32 rows; padded winners (inf selection score,
                # zero vector) must stay inf. astype: no-op for the fp32
                # copy, widens kernel-dtype rows when exact_rescore=False
                g_sel = jnp.take(gf32_l, idx, axis=0).astype(jnp.float32)
                d = (
                    jnp.sum(e32 * e32, axis=1)[:, None]
                    + jnp.sum(g_sel * g_sel, axis=2)
                    - 2.0 * jnp.einsum("qd,qkd->qk", e32, g_sel)
                )
                return jnp.where(jnp.isinf(val), jnp.inf, d)

            return shard_select_merge(
                e_k, gf_l, gn_l, k_eff, shard_rows, rescore=rescore
            )

        ranked = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(GALLERY_AXIS), P(GALLERY_AXIS),
                      P(None, GALLERY_AXIS)),
            out_specs=(P(), P()),
        )

        rr = self.rerank_window
        if rr:
            gather_rows = make_sharded_row_gather(mesh, shard_rows)
            rk1, rk2, rlam = self._rerank_params
            k1c = max(1, min(rk1, rr))
            k2c = max(1, min(rk2, k1c + 1))
            k_final = self.k

        @jax.jit
        def run_sharded(params, batch_stats, gf, gf32, gn, imgs_u8):
            e = embed_q(params, batch_stats, imgs_u8)
            e32 = e.astype(jnp.float32)
            # shard_select_merge's final lax.top_k(-allv) already returns
            # the merged candidates ascending by exact distance — no
            # re-sort needed
            d0, idx0 = ranked(e.astype(kernel_dtype), e32, gf, gf32, gn)
            if not rr:
                return d0, idx0
            # windowed k-reciprocal re-rank of the merged top-r window:
            # candidate FEATURE rows live on whichever shard holds them —
            # one psum gather assembles them, then the replicated per-set
            # core re-ranks (identical math to the single-chip
            # reranked_query / the get_similar --rerank CLI path)
            from ..ops.rerank import _WIN_CHUNK, _windowed_feats

            cand = gather_rows(idx0, gf32)
            vals = _windowed_feats(
                e32, cand, rlam, k1c + 1, k1c // 2 + 1, k2c,
                max(1, min(_WIN_CHUNK, e.shape[0])), self._rerank_dist,
            )
            order = jnp.argsort(vals, axis=1)[:, :k_final]
            return (
                jnp.take_along_axis(vals, order, axis=1),
                jnp.take_along_axis(idx0, order, axis=1),
            )

        return run_sharded

    def query_arrays(self, imgs_u8: np.ndarray):
        """[B, H, W, 3] uint8 (or packed YUV420 [B, 1.5*H*W]) ->
        (distances [B,k], indices [B,k], paths).

        Batches beyond ``max_query_batch`` are processed in chunks: the
        ranking program scores [chunk, G] at fp32, so an unbounded B
        would make peak memory O(B*G) — 4096 queries x a 1M gallery is
        16 GB of scores. Each chunk is still one dispatch; the tail chunk
        is zero-padded to the chunk size so at most two program shapes
        ever compile."""
        b = imgs_u8.shape[0]
        cap = self.max_query_batch
        if b <= cap:
            d, idx = self._run(
                self.params, self.batch_stats, self._gf, self._gf32,
                self._gn, jnp.asarray(imgs_u8),
            )
            d = np.asarray(d)
            idx = np.asarray(idx)
            return d, idx, self.paths[idx]
        ds, idxs = [], []
        for s in range(0, b, cap):
            chunk = imgs_u8[s:s + cap]
            rows = chunk.shape[0]
            if rows < cap:
                chunk = np.concatenate([
                    np.asarray(chunk),
                    np.zeros((cap - rows, *chunk.shape[1:]), chunk.dtype),
                ])
            d, idx = self._run(
                self.params, self.batch_stats, self._gf, self._gf32,
                self._gn, jnp.asarray(chunk),
            )
            ds.append(np.asarray(d)[:rows])
            idxs.append(np.asarray(idx)[:rows])
        d = np.concatenate(ds)
        idx = np.concatenate(idxs)
        return d, idx, self.paths[idx]

    @property
    def model_name(self) -> str:
        """Display name for /healthz — part of the duck-typed surface the
        HTTP server accepts (RetrievalService or a LoadedRetriever
        artifact, inference/export.py)."""
        return str(self.cfg.MODEL.NAME)

    @property
    def ingest_format(self) -> str:
        """'rgb' or 'yuv420' — the ONE ingest decision shared by
        query_files/query_bytes and the HTTP server's /healthz: int8
        serving consumes uint8 RGB directly; otherwise TPU.FAST_DECODE
        selects the packed-YUV420 serving wire format."""
        from .utils import serving_ingest_format

        if self._qfn is not None:
            return "rgb"
        return serving_ingest_format(self.cfg)

    def ingest_bytes(self, blobs: Sequence[bytes]) -> np.ndarray:
        """Encoded image bytes (JPEG/PNG/...) -> the uint8 batch
        query_arrays consumes — RGB [B,H,W,3], or packed YUV420
        [B, 1.5*H*W] on the fast serving ingest. Pure host work (no
        device dispatch), so callers may run it concurrently across
        threads (inference/server.py decodes outside its dispatch
        lock)."""
        from ..data.transforms import ingest_blobs

        return ingest_blobs(
            self.ingest_format, tuple(self.cfg.INPUT.SIZE_TEST), blobs
        )

    def query_bytes(self, blobs: Sequence[bytes]):
        """Encoded image bytes -> (distances, indices, paths)."""
        return self.query_arrays(self.ingest_bytes(blobs))

    def query_files(self, image_paths: Sequence[str]):
        def _read(p):
            with open(p, "rb") as f:
                return f.read()

        return self.query_bytes([_read(p) for p in image_paths])
