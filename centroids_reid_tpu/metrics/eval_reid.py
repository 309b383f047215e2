"""Market1501-protocol CMC / mAP / top-k, fully vectorised.

The reference loops over queries in Python with boolean compaction
(/root/reference/utils/eval_reid.py:25-92). Here the whole metric is
cumsum/mask algebra over the [Q, G] ranked match matrix — one fused XLA
program on device (or vectorised numpy on host):

* per query, gallery entries with the same pid AND same camid are
  discarded (eval_reid.py:49-58); in ``respect_camids`` mode gallery camids
  are *sets* (centroid camid combinations) and the test is membership
  (:52-55) — represented here as bitmasks;
* queries with no remaining positive are dropped from the averages (:63-65);
* CMC: rank of the first hit among the kept entries, cumulative (:67-70);
* AP: mean of precision-at-hit over hits (:74-80);
* top-k hit flags for k in {1,5,10,20,50} (:15,18-22).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K_LIST = (1, 5, 10, 20, 50)


class ReidMetrics(NamedTuple):
    cmc: np.ndarray          # [max_rank] CMC curve
    mAP: float
    all_topk: np.ndarray     # top-k accuracy for K_LIST
    single_performance: np.ndarray  # [num_valid_q, 3] (q_idx, q_pid, AP)


@partial(jax.jit, static_argnums=(6, 7))
def _ranked_metrics_device(
    indices, q_pids, g_pids, q_camids, g_cam_lo, g_cam_hi, max_rank,
    respect_camids,
):
    """Core mask algebra; jit-friendly. In respect_camids mode the gallery
    camid bitmask arrives as TWO int32 words (bits 0-31 / 32-63,
    split_camid_words): JAX downcasts int64 device arrays to int32 when
    x64 is off, which would silently truncate bitmasks for cameras >= 31
    (and a >> shift >= 32 on int32 is undefined). Without respect_camids
    ``g_cam_lo`` holds the plain camids and ``g_cam_hi`` is ignored."""
    g_pids_ord = g_pids[indices]                     # [Q, G]
    lo_ord = g_cam_lo[indices]
    matches = g_pids_ord == q_pids[:, None]

    if respect_camids:
        hi_ord = g_cam_hi[indices]
        use_hi = q_camids >= 32                      # [Q]
        shift = jnp.where(use_hi, q_camids - 32, q_camids)[:, None]
        word = jnp.where(use_hi[:, None], hi_ord, lo_ord)
        in_set = ((word >> shift) & 1).astype(bool)
        remove = matches & in_set
    else:
        remove = matches & (lo_ord == q_camids[:, None])
    keep = ~remove

    hit = matches & keep
    pos = jnp.cumsum(keep, axis=1) - 1               # 0-based rank among kept
    sentinel = jnp.iinfo(pos.dtype).max
    first_rank = jnp.min(jnp.where(hit, pos, sentinel), axis=1)
    valid_q = jnp.any(hit, axis=1)
    n_valid = jnp.maximum(jnp.sum(valid_q), 1)

    ranks = jnp.arange(max_rank)
    cmc_hits = (first_rank[:, None] <= ranks[None, :]) & valid_q[:, None]
    cmc = jnp.sum(cmc_hits, axis=0) / n_valid

    cum_hits = jnp.cumsum(hit, axis=1)
    prec = cum_hits / jnp.maximum(pos + 1, 1)
    num_rel = jnp.sum(hit, axis=1)
    ap = jnp.sum(jnp.where(hit, prec, 0.0), axis=1) / jnp.maximum(num_rel, 1)
    mAP = jnp.sum(jnp.where(valid_q, ap, 0.0)) / n_valid

    topk = jnp.stack(
        [jnp.sum((first_rank < kk) & valid_q) / n_valid for kk in K_LIST]
    )
    return cmc, mAP, topk, ap, valid_q


def eval_func(
    indices,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    max_rank: int = 50,
    respect_camids: bool = False,
):
    """Returns ReidMetrics. ``indices`` is the [Q, G] argsorted gallery order.

    When ``respect_camids``, ``g_camids`` must be an integer bitmask per
    gallery entry (bit c set <=> camera c contributed to that centroid) and
    ``q_camids`` plain camera ids.
    """
    num_g = indices.shape[1]
    if num_g < max_rank:
        max_rank = num_g
        print(f"Note: number of gallery samples is quite small, got {num_g}")

    lo, hi = split_camid_words(g_camids)
    cmc, mAP, topk, ap, valid_q = _ranked_metrics_device(
        jnp.asarray(indices),
        jnp.asarray(np.asarray(q_pids, np.int64)),
        jnp.asarray(np.asarray(g_pids, np.int64)),
        jnp.asarray(np.asarray(q_camids, np.int32)),
        jnp.asarray(lo),
        jnp.asarray(hi),
        max_rank,
        bool(respect_camids),
    )
    ap = np.asarray(ap)
    valid = np.asarray(valid_q)
    q_idx = np.nonzero(valid)[0]
    single = np.stack(
        [q_idx, np.asarray(q_pids)[q_idx], ap[q_idx]], axis=1
    ) if q_idx.size else np.zeros((0, 3))
    return ReidMetrics(
        cmc=np.asarray(cmc),
        mAP=float(mAP),
        all_topk=np.asarray(topk),
        single_performance=single,
    )


def split_camid_words(g_camids) -> tuple:
    """int64 camid bitmasks (or plain camids) -> two int32 words holding
    bits 0-31 and 32-63 — the device-safe representation (x64-off JAX
    truncates int64 device arrays to int32). Bit 31 of a word lands on
    the int32 sign bit; extraction stays correct because
    ``(word >> 31) & 1`` reads the original bit under an arithmetic
    shift."""
    g64 = np.asarray(g_camids, np.int64)
    lo = (g64 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    hi = ((g64 >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return lo, hi


def camid_sets_to_bitmask(camid_sets) -> np.ndarray:
    """[[camids...]] -> int64 bitmasks (cameras are small ints, <= 62)."""
    out = np.zeros(len(camid_sets), np.int64)
    for i, cams in enumerate(camid_sets):
        m = 0
        for c in np.atleast_1d(cams):
            m |= 1 << int(c)
        out[i] = m
    return out
