"""Streaming CMC / mAP / top-k: evaluation at galleries where [Q, G] can't exist.

The reference chunks the distance matrix on the host past 30k gallery rows
(/root/reference/utils/reid_metric.py:93-110) but still materialises the
full [Q, G] matrix and argsorts it (:126-137) — host RAM is the ceiling.
The round-2 evaluator moved that matrix + argsort into HBM
(metrics/r1_map.py), making one chip's HBM the ceiling: at a 1M-row
gallery, Q=3,368 x 1M fp32 scores plus int argsort indices is ~27 GB.

This module removes the ceiling: mAP/CMC/top-k only need each *positive's
rank*, and a positive's rank among the kept gallery entries equals the
COUNT of kept entries ordered strictly before it. Counting distributes
over gallery chunks, so the whole metric is two scans over [Qc, C] score
tiles — no [Q, G] tensor, no global sort, O(Q*H) state (H = max positives
per query):

1. *extract* pass: each positive's distance is pulled out of the very
   score tile it lives in (``where(j == pos_idx, s, 0)`` summed over
   chunks) — bit-identical to the value the counting pass compares
   against, so self-comparison ties are impossible by construction;
2. *count* pass: ``rank[q,h] = #{kept j : (d_qj, j) < (d_pos, pos_idx)}``
   accumulated chunk by chunk (lexicographic on (distance, index) — the
   order a stable argsort yields).

From ranks, the Market1501-protocol metrics are closed-form
(eval_reid.py:25-92 parity, oracle-tested in tests/test_streaming_eval.py):

* ``first_rank[q] = min_h rank[q,h]`` -> CMC curve and top-k flags;
* precision at hit h = (hrank_h + 1) / (rank_h + 1) where hrank is the
  hit's rank among the query's hits -> AP as their mean over num_rel.

``mesh=`` shards the gallery rows over the mesh's gallery axis
(parallel/mesh.py): each device counts against its shard and the partial
counts/extractions ``psum`` — the multi-chip evaluation path the
reference's host chunking stands in for (SURVEY §5 "gallery size ...
shard the Q x G distance computation over devices").
"""

from __future__ import annotations

import functools
from collections import defaultdict
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.distances import get_dist_func
from .eval_reid import K_LIST, ReidMetrics

_G_CHUNK = 8192    # gallery rows per scanned score tile
_Q_CHUNK = 128     # query rows per dispatched program
# positives per inner tile: the extract/count intermediates are
# [Qc, Hc, C] with Hc FIXED — a pid-heavy gallery (one pid = 30% of 100k
# rows makes H = max positives per query reach tens of thousands) scans
# more Hc-tiles instead of growing the tile, so device memory is flat in H
# (the gallery scores [Qc, C] are computed once per gallery chunk and
# reused across the positives tiles)
_H_CHUNK = 64


def _positives_table(q_pids, g_pids, q_camids, g_camids,
                     respect_camids: bool) -> np.ndarray:
    """[Q, H] gallery indices of each query's HITS (same pid, kept under
    the camid-removal rule, eval_reid.py:49-58), -1 padded.

    In ``respect_camids`` mode ``g_camids`` are bitmask ints and removal is
    set membership (eval_reid.py:52-55)."""
    by_pid = defaultdict(list)
    for j, p in enumerate(np.asarray(g_pids)):
        by_pid[int(p)].append(j)
    g_camids = np.asarray(g_camids)
    lists = []
    for qi in range(len(q_pids)):
        cand = by_pid.get(int(q_pids[qi]), [])
        qc = int(q_camids[qi])
        if respect_camids:
            hits = [j for j in cand if not ((int(g_camids[j]) >> qc) & 1)]
        else:
            hits = [j for j in cand if int(g_camids[j]) != qc]
        lists.append(hits)
    h = max([len(x) for x in lists] + [1])
    h += (-h) % _H_CHUNK  # whole number of device-side positives tiles
    pos = np.full((len(q_pids), h), -1, np.int32)
    for qi, x in enumerate(lists):
        pos[qi, : len(x)] = x
    return pos


def _chunk_scores(qf_c, gf_sl, dist: str):
    return get_dist_func(dist, eval_mode=True)(qf_c, gf_sl)


def _tile(qf_c, gf, j0, c, g_chunk: int, dist: str):
    gf_sl = jax.lax.dynamic_slice_in_dim(gf, c * g_chunk, g_chunk, 0)
    s = _chunk_scores(qf_c, gf_sl, dist)                    # [Qc, C] fp32
    jg = j0 + c * g_chunk + jnp.arange(g_chunk, dtype=jnp.int32)
    return s, jg


def _h_tiles(pos_c):
    """[Qc, H] -> [n_h, Qc, _H_CHUNK] (H is padded by the caller)."""
    qc, h = pos_c.shape
    return jnp.moveaxis(pos_c.reshape(qc, h // _H_CHUNK, _H_CHUNK), 1, 0)


def _h_untile(x_r):
    """[n_h, Qc, Hc] -> [Qc, H]."""
    n_h, qc, hc = x_r.shape
    return jnp.moveaxis(x_r, 0, 1).reshape(qc, n_h * hc)


def _extract_scan(qf_c, pos_c, gf, j0, g_chunk: int, dist: str):
    """Pull each positive's distance out of the score tile it lives in.

    ``j0``: global index of this gallery block's first row (0 on a single
    device; shard offset under shard_map). The positives axis is scanned
    in ``_H_CHUNK`` tiles so the [Qc, Hc, C] compare-intermediate stays
    fixed-size regardless of H (pid-heavy galleries)."""
    n_chunks = gf.shape[0] // g_chunk
    pos_r = _h_tiles(pos_c)

    def extract(dpos_r, c):
        s, jg = _tile(qf_c, gf, j0, c, g_chunk, dist)

        def h_body(_, xs):
            pos_h, dpos_h = xs                               # [Qc, Hc]
            at_pos = pos_h[:, :, None] == jg[None, None, :]  # [Qc, Hc, C]
            return None, dpos_h + jnp.sum(
                jnp.where(at_pos, s[:, None, :], 0.0), axis=2
            )

        _, dpos_r = jax.lax.scan(h_body, None, (pos_r, dpos_r))
        return dpos_r, None

    dpos_r, _ = jax.lax.scan(
        extract,
        jnp.zeros(pos_r.shape, jnp.float32),
        jnp.arange(n_chunks),
    )
    return _h_untile(dpos_r)


def _count_scan(qf_c, q_pids_c, q_camids_c, pos_c, dpos, gf, g_pids,
                g_cam_lo, g_cam_hi, g_valid, j0, g_chunk: int, dist: str,
                respect_camids: bool):
    """rank[q,h] = #{kept j in this block: (d_qj, j) < (dpos, pos_idx)}.
    ``dpos`` must be the GLOBAL extraction (psum'd first when sharded).
    Camid bitmasks arrive as two int32 words (bits 0-31 / 32-63;
    eval_reid.split_camid_words): x64-off JAX would truncate int64 masks
    for cameras >= 31 and a >> shift >= 32 on int32 is undefined."""
    n_chunks = gf.shape[0] // g_chunk

    pos_r = _h_tiles(pos_c)
    dpos_r = _h_tiles(dpos)

    def count(ranks_r, c):
        s, jg = _tile(qf_c, gf, j0, c, g_chunk, dist)
        g_pids_sl = jax.lax.dynamic_slice_in_dim(g_pids, c * g_chunk,
                                                 g_chunk, 0)
        lo_sl = jax.lax.dynamic_slice_in_dim(g_cam_lo, c * g_chunk,
                                             g_chunk, 0)
        g_val_sl = jax.lax.dynamic_slice_in_dim(g_valid, c * g_chunk,
                                                g_chunk, 0)
        match = g_pids_sl[None, :] == q_pids_c[:, None]
        if respect_camids:
            hi_sl = jax.lax.dynamic_slice_in_dim(g_cam_hi, c * g_chunk,
                                                 g_chunk, 0)
            use_hi = q_camids_c >= 32                       # [Qc]
            shift = jnp.where(use_hi, q_camids_c - 32, q_camids_c)
            word = jnp.where(use_hi[:, None], hi_sl[None, :],
                             lo_sl[None, :])
            same = ((word >> shift[:, None]) & 1) == 1
        else:
            same = lo_sl[None, :] == q_camids_c[:, None]
        keep = (~(match & same)) & g_val_sl[None, :]        # [Qc, C]

        def h_body(_, xs):
            pos_h, dpos_h, ranks_h = xs                     # [Qc, Hc]
            before = (s[:, None, :] < dpos_h[:, :, None]) | (
                (s[:, None, :] == dpos_h[:, :, None])
                & (jg[None, None, :] < pos_h[:, :, None])
            )                                               # [Qc, Hc, C]
            return None, ranks_h + jnp.sum(
                (keep[:, None, :] & before).astype(jnp.int32), axis=2
            )

        _, ranks_r = jax.lax.scan(h_body, None, (pos_r, dpos_r, ranks_r))
        return ranks_r, None

    ranks_r, _ = jax.lax.scan(
        count, jnp.zeros(pos_r.shape, jnp.int32), jnp.arange(n_chunks),
    )
    return _h_untile(ranks_r)


@partial(jax.jit,
         static_argnames=("g_chunk", "dist", "respect_camids"))
def _stream_ranks(qf_c, q_pids_c, q_camids_c, pos_c, gf, g_pids, g_cam_lo,
                  g_cam_hi, g_valid, g_chunk: int, dist: str,
                  respect_camids: bool):
    j0 = jnp.int32(0)
    dpos = _extract_scan(qf_c, pos_c, gf, j0, g_chunk, dist)
    ranks = _count_scan(
        qf_c, q_pids_c, q_camids_c, pos_c, dpos, gf, g_pids, g_cam_lo,
        g_cam_hi, g_valid, j0, g_chunk, dist, respect_camids,
    )
    return dpos, ranks


@functools.lru_cache(maxsize=32)
def _stream_ranks_sharded_program(mesh, shard_rows: int, g_chunk: int,
                                  dist: str, respect_camids: bool):
    """Build + jit the sharded rank-count program ONCE per
    (mesh, layout, flags) — building a fresh shard_map + jax.jit object
    per 128-query chunk re-traced every chunk (the same retrace class
    parallel/retrieval.py's _sharded_topk_program fixed)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import GALLERY_AXIS, shard_map

    def local(qf_l, qp_l, qc_l, pos_l, gf_l, gp_l, gclo_l, gchi_l, gv_l):
        j0 = (jax.lax.axis_index(GALLERY_AXIS) * shard_rows).astype(
            jnp.int32
        )
        # each positive lives in exactly ONE shard, so the global dpos is
        # the psum of the local extractions — and it must be global BEFORE
        # counting (a shard's kept entries compare against positives that
        # live on other shards)
        dpos = jax.lax.psum(
            _extract_scan(qf_l, pos_l, gf_l, j0, g_chunk, dist),
            GALLERY_AXIS,
        )
        ranks = _count_scan(
            qf_l, qp_l, qc_l, pos_l, dpos, gf_l, gp_l, gclo_l, gchi_l,
            gv_l, j0, g_chunk, dist, respect_camids,
        )
        return dpos, jax.lax.psum(ranks, GALLERY_AXIS)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(GALLERY_AXIS), P(GALLERY_AXIS),
                  P(GALLERY_AXIS), P(GALLERY_AXIS), P(GALLERY_AXIS)),
        out_specs=(P(), P()),
    ))


class StreamRanks(NamedTuple):
    """Per-hit rank state from the two streaming passes (host arrays)."""

    pos: np.ndarray       # [Q, H] gallery index of each hit, -1 padded
    dpos: np.ndarray      # [Q, H] fp32 each hit's extracted distance
    ranks: np.ndarray     # [Q, H] int32 hit's rank among KEPT entries
    num_rel: np.ndarray   # [Q] number of hits per query


def compute_stream_ranks(
    qf,
    gf,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    respect_camids: bool = False,
    dist: str = "euclidean",
    mesh=None,
    g_chunk: int = _G_CHUNK,
) -> StreamRanks:
    """The two streaming passes (extract + count) over the whole query
    set: returns host arrays — each hit's gallery index, distance, and
    rank among the kept entries. The closed-form metric derivation
    (``_metrics_from_ranks``) and the windowed re-rank fix-up
    (``eval_func_streaming_reranked``) both build on these."""
    qf = np.asarray(qf, np.float32)
    # the gallery may be a device array (a 1M x 2048 fp32 gallery is 8 GB —
    # a host round-trip would double-buffer it); keep it wherever it lives
    gf = jnp.asarray(gf, jnp.float32)
    q_pids = np.asarray(q_pids)
    g_pids = np.asarray(g_pids)
    q_camids = np.asarray(q_camids)
    g_camids = np.asarray(g_camids)
    num_q, num_g = qf.shape[0], gf.shape[0]

    pos = _positives_table(q_pids, g_pids, q_camids, g_camids,
                           respect_camids)
    num_rel = (pos >= 0).sum(axis=1)

    # pad gallery to a whole number of chunks (and shards); padded rows are
    # never kept
    shards = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    unit = g_chunk * shards
    pad_g = (-num_g) % unit
    gf_p = jnp.concatenate(
        [gf, jnp.zeros((pad_g, gf.shape[1]), jnp.float32)]
    ) if pad_g else gf
    g_pids_p = np.concatenate([g_pids, np.full(pad_g, -1, g_pids.dtype)])
    g_camids_p = np.concatenate(
        [g_camids, np.full(pad_g, -1, g_camids.dtype)]
    )
    g_valid = np.concatenate(
        [np.ones(num_g, bool), np.zeros(pad_g, bool)]
    )
    from .eval_reid import split_camid_words

    g_cam_lo, g_cam_hi = split_camid_words(g_camids_p)
    dev = [gf_p] + [jnp.asarray(x) for x in
                    (g_pids_p.astype(np.int32),
                     g_cam_lo, g_cam_hi, g_valid)]
    if mesh is not None:
        # place the (possibly multi-GB) gallery into its sharded layout
        # ONCE — not per query chunk — and reuse one compiled program
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import GALLERY_AXIS

        sh_g = NamedSharding(mesh, P(GALLERY_AXIS))
        sh_r = NamedSharding(mesh, P())
        dev = [jax.device_put(x, sh_g) for x in dev]
        sharded_prog = _stream_ranks_sharded_program(
            mesh, gf_p.shape[0] // mesh.shape[GALLERY_AXIS], g_chunk,
            dist, respect_camids,
        )

    dpos_all, ranks_all = [], []
    for s in range(0, num_q, _Q_CHUNK):
        rows = min(_Q_CHUNK, num_q - s)
        pad_q = _Q_CHUNK - rows
        qf_c = np.concatenate(
            [qf[s:s + rows], np.zeros((pad_q, qf.shape[1]), np.float32)]
        )
        qp_c = np.concatenate(
            [q_pids[s:s + rows].astype(np.int32), np.full(pad_q, -2, np.int32)]
        )
        qc_c = np.concatenate(
            [q_camids[s:s + rows].astype(np.int32), np.zeros(pad_q, np.int32)]
        )
        pos_c = np.concatenate(
            [pos[s:s + rows], np.full((pad_q, pos.shape[1]), -1, np.int32)]
        )
        if mesh is None:
            dpos, ranks = _stream_ranks(
                jnp.asarray(qf_c), jnp.asarray(qp_c), jnp.asarray(qc_c),
                jnp.asarray(pos_c), *dev, g_chunk=g_chunk, dist=dist,
                respect_camids=respect_camids,
            )
        else:
            dpos, ranks = sharded_prog(
                jax.device_put(qf_c, sh_r), jax.device_put(qp_c, sh_r),
                jax.device_put(qc_c, sh_r), jax.device_put(pos_c, sh_r),
                *dev,
            )
        dpos_all.append(np.asarray(dpos)[:rows])
        ranks_all.append(np.asarray(ranks)[:rows])
    return StreamRanks(
        pos=pos,
        dpos=np.concatenate(dpos_all),
        ranks=np.concatenate(ranks_all),
        num_rel=num_rel,
    )


def _hrank_lexsort(pos: np.ndarray, dpos: np.ndarray) -> np.ndarray:
    """hrank[q, h]: hit h's rank among query q's hits by (distance, index)
    — the stable-argsort tie order.

    Lexsort per query instead of the all-pairs [Q, H, H] "before" count —
    O(Q*H log H) time and O(Q*H) memory, so a pid-heavy gallery (H in the
    tens of thousands) stays flat. Invalid (padded) slots sort last via
    +inf keys; (distance, index) pairs are unique among valid hits, so
    the sorted position IS the count of strictly-before hits."""
    hvalid = pos >= 0
    d_key = np.where(hvalid, dpos, np.inf)
    i_key = np.where(hvalid, pos, np.iinfo(np.int32).max)
    order = np.lexsort((i_key, d_key), axis=-1)              # [Q, H]
    hrank = np.empty(pos.shape, np.int64)
    np.put_along_axis(
        hrank, order, np.broadcast_to(np.arange(pos.shape[1]), pos.shape),
        axis=1,
    )
    return hrank


def _metrics_from_ranks(
    pos: np.ndarray,
    ranks: np.ndarray,
    hrank: np.ndarray,
    num_rel: np.ndarray,
    q_pids: np.ndarray,
    max_rank: int,
) -> ReidMetrics:
    """Closed-form Market-protocol metrics from per-hit ranks (host,
    O(Q*H)): ``ranks`` is each hit's rank among the query's KEPT gallery
    entries, ``hrank`` its rank among the query's hits — precision at hit
    h is (hrank_h + 1) / (ranks_h + 1), AP their mean over num_rel
    (eval_reid.py:25-92 parity, oracle-tested)."""
    hvalid = pos >= 0
    big = np.int64(np.iinfo(np.int32).max)
    first_rank = np.where(hvalid, ranks, big).min(axis=1)
    valid_q = num_rel > 0
    n_valid = max(int(valid_q.sum()), 1)

    prec = np.where(hvalid, (hrank + 1) / np.maximum(ranks + 1, 1), 0.0)
    ap = prec.sum(axis=1) / np.maximum(num_rel, 1)

    ranks_axis = np.arange(max_rank)
    cmc = (
        ((first_rank[:, None] <= ranks_axis[None, :]) & valid_q[:, None])
        .sum(axis=0) / n_valid
    )
    mAP = float(ap[valid_q].sum() / n_valid)
    topk = np.array(
        [((first_rank < kk) & valid_q).sum() / n_valid for kk in K_LIST]
    )
    q_idx = np.nonzero(valid_q)[0]
    single = np.stack(
        [q_idx, q_pids[q_idx], ap[q_idx]], axis=1
    ) if q_idx.size else np.zeros((0, 3))
    return ReidMetrics(
        cmc=cmc.astype(np.float64), mAP=mAP, all_topk=topk,
        single_performance=single,
    )


def _clamp_max_rank(max_rank: int, num_g: int) -> int:
    if num_g < max_rank:
        print(f"Note: number of gallery samples is quite small, got {num_g}")
        return num_g
    return max_rank


def eval_func_streaming(
    qf,
    gf,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    max_rank: int = 50,
    respect_camids: bool = False,
    dist: str = "euclidean",
    mesh=None,
    g_chunk: int = _G_CHUNK,
) -> ReidMetrics:
    """ReidMetrics from raw features without materialising [Q, G].

    Takes FEATURES (already normalised if TEST.FEAT_NORM), not a distance
    matrix — the point is that the distance matrix never exists. Results
    match ``eval_func`` on the argsorted matrix exactly (stable-sort tie
    order included). ``mesh`` shards gallery rows over the mesh's gallery
    axis."""
    sr = compute_stream_ranks(
        qf, gf, q_pids, g_pids, q_camids, g_camids,
        respect_camids=respect_camids, dist=dist, mesh=mesh,
        g_chunk=g_chunk,
    )
    max_rank = _clamp_max_rank(max_rank, int(np.shape(gf)[0]))
    return _metrics_from_ranks(
        sr.pos, sr.ranks, _hrank_lexsort(sr.pos, sr.dpos), sr.num_rel,
        np.asarray(q_pids), max_rank,
    )


def _window_positions(ridx: np.ndarray, pos: np.ndarray,
                      num_g: int) -> np.ndarray:
    """For each hit ``pos[q, h]``, its position in query q's re-ranked
    window ``ridx[q, :]`` — or -1 when the hit is outside the window.
    Vectorised row-batched lookup: per-row sort + one global searchsorted
    over (row * (G+1) + index) keys (rows are disjoint key ranges, and the
    -1 pad key row*(G+1)-1 can never collide with a real key because real
    in-row offsets stop at G-1)."""
    nq, r = ridx.shape
    base = np.arange(nq, dtype=np.int64)[:, None] * (num_g + 1)
    order = np.argsort(ridx, axis=1, kind="stable")
    sorted_idx = np.take_along_axis(ridx, order, axis=1)
    flat = (sorted_idx.astype(np.int64) + base).ravel()
    keys = (pos.astype(np.int64) + base).ravel()
    loc = np.searchsorted(flat, keys)
    found = (loc < flat.size) & (flat[np.minimum(loc, flat.size - 1)] == keys)
    loc = loc.reshape(nq, -1)
    found = found.reshape(nq, -1)
    local = np.clip(loc - np.arange(nq, dtype=np.int64)[:, None] * r,
                    0, r - 1)
    wpos = np.take_along_axis(order, local, axis=1)
    return np.where(found, wpos, -1)


def eval_func_streaming_reranked(
    qf,
    gf,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    r: int = 500,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    max_rank: int = 50,
    respect_camids: bool = False,
    dist: str = "euclidean",
    mesh=None,
    use_pallas: bool = True,
    g_chunk: int = _G_CHUNK,
) -> ReidMetrics:
    """Streaming metrics under WINDOWED k-reciprocal re-ranking — the
    evaluation-path composition of the streaming rank counter with
    ``ops.rerank.rerank_topk``, so ``TPU.RERANK`` works at ANY gallery
    scale (the full re-ranker's O(N^2) guard stops at ~26k rows; the
    reference's own scale mechanism is host chunking,
    /root/reference/utils/reid_metric.py:93-110, which re-ranking must
    likewise respect).

    Ranking semantics (per query): positions 0..r-1 are the re-ranked
    top-r candidate window (``rerank_topk`` order), positions r.. keep
    the original (distance, index) stable order. Metrics follow from the
    per-hit ranks without ever materialising [Q, G]:

    * a hit OUTSIDE the window keeps its streaming rank/hit-rank — the
      window is a permutation of the original top-r, so every window
      entry precedes every tail entry in both orders and tail counts are
      unchanged;
    * a hit INSIDE the window takes rank = #kept window entries before
      its re-ranked position and hit-rank = #window hits before it
      (tail hits all rank after).

    With ``r >= G`` the stitched ranking IS the full windowed re-ranked
    order (oracle-tested against ``eval_func`` on the explicit stitched
    indices in tests/test_streaming_eval.py). Ties between re-ranked
    values resolve in candidate-window order rather than gallery-index
    order — measure-zero for float distances. The same caveat applies to
    window MEMBERSHIP: the stitching assumes the top-r window is the
    first-r prefix of the streaming order, which holds except when two
    entries with bit-identical distances straddle rank r exactly (e.g.
    byte-duplicate gallery images) and the two selectors break that tie
    differently — a tail hit displaced by its duplicate can then have
    its rank understated by the duplicate's window slot. Exact-tie-at-
    the-boundary only; dedup the gallery or widen r past the duplicate
    run if it matters.
    """
    from ..ops.rerank import rerank_topk

    q_pids = np.asarray(q_pids)
    g_pids = np.asarray(g_pids)
    q_camids = np.asarray(q_camids)
    g_camids = np.asarray(g_camids)
    # one device copy of the (possibly multi-GB) gallery, shared by the
    # streaming pass and the candidate-window retrieval
    gf = jnp.asarray(gf, jnp.float32)
    sr = compute_stream_ranks(
        qf, gf, q_pids, g_pids, q_camids, g_camids,
        respect_camids=respect_camids, dist=dist, mesh=mesh,
        g_chunk=g_chunk,
    )
    num_g = int(gf.shape[0])

    _, ridx = rerank_topk(
        qf, gf, r=r, k1=k1, k2=k2, lambda_value=lambda_value, dist=dist,
        use_pallas=use_pallas, mesh=mesh,
    )
    ridx = np.asarray(ridx)                     # [Q, r] re-ranked window

    # keep/hit masks per window entry under the protocol's junk-removal
    # rule (same-pid + same-camid discarded; bitmask membership when
    # respect_camids — eval_reid.py:49-58)
    wp = g_pids[ridx]
    match = wp == q_pids[:, None]
    if respect_camids:
        wc = g_camids[ridx].astype(np.int64)
        same = ((wc >> q_camids[:, None].astype(np.int64)) & 1) == 1
    else:
        same = g_camids[ridx] == q_camids[:, None]
    keep = ~(match & same)
    hit = match & keep
    kept_before = np.cumsum(keep, axis=1) - keep   # exclusive cumsums
    hits_before = np.cumsum(hit, axis=1) - hit

    win_pos = _window_positions(ridx, sr.pos, num_g)
    in_win = win_pos >= 0
    j = np.clip(win_pos, 0, ridx.shape[1] - 1)
    ranks = np.where(
        in_win, np.take_along_axis(kept_before, j, axis=1), sr.ranks
    )
    hrank = np.where(
        in_win, np.take_along_axis(hits_before, j, axis=1),
        _hrank_lexsort(sr.pos, sr.dpos),
    )
    max_rank = _clamp_max_rank(max_rank, num_g)
    return _metrics_from_ranks(
        sr.pos, ranks, hrank, sr.num_rel, q_pids, max_rank,
    )
