"""Numpy loop oracles for the eval subsystem (written from the documented
reference semantics in SURVEY.md §2.7; see citations in
centroids_reid_tpu/metrics/)."""

from collections import defaultdict

import numpy as np

K_LIST = [1, 5, 10, 20, 50]


def oracle_eval_func(indices, q_pids, g_pids, q_camids, g_camids,
                     max_rank=50, respect_camids=False):
    """Per-query loop with boolean compaction (utils/eval_reid.py:25-92).

    In respect mode g_camids is a list of camid collections per gallery
    entry and q_camids plain ints.
    """
    num_q, num_g = indices.shape
    max_rank = min(max_rank, num_g)
    matches = (np.asarray(g_pids)[indices] == np.asarray(q_pids)[:, None])

    all_cmc, all_ap, topk_rows, singles = [], [], [], []
    for qi in range(num_q):
        order = indices[qi]
        if respect_camids:
            remove = np.array([
                (g_pids[j] == q_pids[qi]) and (q_camids[qi] in g_camids[j])
                for j in order
            ])
        else:
            remove = (np.asarray(g_pids)[order] == q_pids[qi]) & (
                np.asarray(g_camids)[order] == q_camids[qi]
            )
        keep = ~remove
        orig_cmc = matches[qi][keep]
        if not orig_cmc.any():
            continue
        cmc = orig_cmc.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_rel = orig_cmc.sum()
        tmp = orig_cmc.cumsum() / (np.arange(len(orig_cmc)) + 1.0)
        ap = (tmp * orig_cmc).sum() / num_rel
        all_ap.append(ap)
        singles.append([qi, q_pids[qi], ap])
        topk_rows.append([int(orig_cmc[:k].any()) for k in K_LIST])

    cmc = np.asarray(all_cmc, np.float32).sum(0) / len(all_cmc)
    return cmc, float(np.mean(all_ap)), np.mean(topk_rows, 0), np.asarray(singles)


def oracle_plain_centroids(embeddings, labels, num_query):
    """modelling/bases.py:238-260."""
    emb_q, lab_q = embeddings[:num_query], labels[:num_query]
    emb_g, lab_g = embeddings[num_query:], labels[num_query:]
    by_pid = defaultdict(list)
    for i, lab in enumerate(lab_g):
        by_pid[lab].append(i)
    cents, labs = [], []
    for lab in sorted(np.unique(list(by_pid.keys()))):
        cents.append(emb_g[by_pid[lab]].mean(0))
        labs.append(lab)
    emb = np.concatenate([emb_q, np.stack(cents)])
    out_lab = np.concatenate([lab_q, np.asarray(labs)])
    camids = np.concatenate([np.zeros_like(lab_q), np.ones(len(labs), lab_q.dtype)])
    return emb, out_lab, camids


def oracle_camera_aware_centroids(embeddings, labels, camids, num_query):
    """modelling/bases.py:205-236,251-253. Returns camids as lists."""
    emb_q, lab_q, cam_q = (
        embeddings[:num_query], labels[:num_query], camids[:num_query]
    )
    emb_g, lab_g, cam_g = (
        embeddings[num_query:], labels[num_query:], camids[num_query:]
    )
    g_by_pid, q_by_pid = defaultdict(list), defaultdict(list)
    for i, lab in enumerate(lab_g):
        g_by_pid[lab].append(i)
    for i, lab in enumerate(lab_q):
        q_by_pid[lab].append(i)

    cents, labs, cams = [], [], []
    for lab in sorted(np.unique(list(g_by_pid.keys()))):
        combos = set()
        inds = np.asarray(g_by_pid[lab])
        sel_g = cam_g[inds]
        sel_q = cam_q[q_by_pid[lab]] if q_by_pid[lab] else np.array([])
        for cur in sorted(np.unique(sel_q)):
            ci = np.where(sel_g != cur)[0]
            if ci.shape[0] == 0:
                continue
            used = tuple(sorted({int(c) for c in sel_g if c != cur}))
            if used in combos:
                continue
            combos.add(used)
            cents.append(emb_g[inds][ci].mean(0))
            labs.append(lab)
            cams.append(list(used))

    emb = np.concatenate([emb_q, np.stack(cents)]) if cents else emb_q
    out_lab = np.concatenate([lab_q, np.asarray(labs, lab_q.dtype)])
    out_cams = [[int(c)] for c in cam_q] + cams
    return emb, out_lab, out_cams
