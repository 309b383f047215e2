"""Eval-time centroid construction (plain and camera-aware).

Reference: ``validation_create_centroids``
(/root/reference/modelling/bases.py:179-262).

* plain mode: one centroid per gallery pid = mean of its gallery
  embeddings, ordered by sorted pid; output = [query embeddings; centroids]
  with dummy camids (query 0, gallery 1) (:238-260);
* camera-aware mode (KEEP_CAMID_CENTROIDS): for each pid and each *query*
  camera id of that pid (sorted unique), build a centroid from gallery
  images of the OTHER cameras; deduplicate identical used-camera
  combinations (:205-236). Gallery pids with no query image produce no
  centroid. Query camids become singleton sets (:251-253).

Plain mode is a device segment-mean (one XLA op). Camera-aware mode is
host-side — it is tiny combinatorics over at most |pids| x |cams| groups —
but the means are vectorised numpy.
"""

from collections import defaultdict
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CentroidEvalSet(NamedTuple):
    embeddings: np.ndarray   # [num_query + num_centroids, D]
    labels: np.ndarray       # [num_query + num_centroids]
    camids: np.ndarray       # plain camids, or bitmasks when camera-aware
    respect_camids: bool


@jax.jit
def _segment_mean(emb, seg_ids, num_segments_arr):
    num_segments = num_segments_arr.shape[0]
    sums = jax.ops.segment_sum(emb, seg_ids, num_segments=num_segments)
    cnts = jax.ops.segment_sum(
        jnp.ones((emb.shape[0],), emb.dtype), seg_ids, num_segments=num_segments
    )
    return sums / jnp.maximum(cnts, 1.0)[:, None]


def build_plain_centroids(
    embeddings: np.ndarray, labels: np.ndarray, num_query: int
) -> CentroidEvalSet:
    """Device segment-mean per gallery pid (bases.py:238-242,255-260)."""
    emb_q = embeddings[:num_query]
    lab_q = labels[:num_query]
    emb_g = embeddings[num_query:]
    lab_g = labels[num_query:]

    unique = np.sort(np.unique(lab_g))
    pid_to_seg = {pid: i for i, pid in enumerate(unique)}
    seg_ids = np.asarray([pid_to_seg[p] for p in lab_g], np.int32)
    centroids = np.asarray(
        _segment_mean(
            jnp.asarray(emb_g, jnp.float32),
            jnp.asarray(seg_ids),
            jnp.zeros((len(unique),), jnp.int32),
        )
    )
    out_emb = np.concatenate([emb_q, centroids], axis=0)
    out_lab = np.concatenate([lab_q, unique])
    camids = np.concatenate(
        [np.zeros(num_query, np.int64), np.ones(len(unique), np.int64)]
    )
    return CentroidEvalSet(out_emb, out_lab, camids, False)


def build_camera_aware_centroids(
    embeddings: np.ndarray,
    labels: np.ndarray,
    camids: np.ndarray,
    num_query: int,
) -> CentroidEvalSet:
    """Camera-aware dedup construction (bases.py:205-236,251-253).

    Returned ``camids``: query rows keep their plain camera id, centroid
    rows carry an int64 bitmask (OR of contributing cameras) — together they
    express the list-membership removal test of eval_func
    (eval_reid.py:52-55) as a bit test.
    """
    emb_q = embeddings[:num_query]
    lab_q = labels[:num_query]
    cam_q = camids[:num_query]
    emb_g = embeddings[num_query:]
    lab_g = labels[num_query:]
    cam_g = camids[num_query:]

    g_by_pid = defaultdict(list)
    for i, pid in enumerate(lab_g):
        g_by_pid[pid].append(i)
    q_by_pid = defaultdict(list)
    for i, pid in enumerate(lab_q):
        q_by_pid[pid].append(i)

    cent_emb: List[np.ndarray] = []
    cent_lab: List[int] = []
    cent_mask: List[int] = []

    for pid in sorted(np.unique(lab_g)):
        inds = np.asarray(g_by_pid[pid])
        cams_g = cam_g[inds]
        q_inds = q_by_pid.get(pid, [])
        seen_combos = set()
        for current in sorted(np.unique(cam_q[q_inds])) if q_inds else []:
            sel = np.nonzero(cams_g != current)[0]
            if sel.size == 0:
                continue
            used = tuple(sorted(np.unique(cams_g[sel])))
            if used in seen_combos:
                continue
            seen_combos.add(used)
            cent_emb.append(emb_g[inds[sel]].mean(axis=0))
            cent_lab.append(pid)
            mask = 0
            for c in used:
                mask |= 1 << int(c)
            cent_mask.append(mask)

    centroids = (
        np.stack(cent_emb) if cent_emb else np.zeros((0, emb_g.shape[1]))
    )
    out_emb = np.concatenate([emb_q, centroids], axis=0)
    out_lab = np.concatenate([lab_q, np.asarray(cent_lab, lab_q.dtype)])
    out_cam = np.concatenate(
        [np.asarray(cam_q, np.int64), np.asarray(cent_mask, np.int64)]
    )
    return CentroidEvalSet(out_emb, out_lab, out_cam, True)


def build_centroid_eval_set(
    embeddings, labels, camids, num_query, respect_camids: bool
) -> CentroidEvalSet:
    if respect_camids:
        return build_camera_aware_centroids(
            embeddings, labels, camids, num_query
        )
    return build_plain_centroids(embeddings, labels, num_query)
