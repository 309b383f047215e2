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


def oracle_rerank(qf, gf, k1=20, k2=6, lambda_value=0.3, dist="euclidean"):
    """Loop implementation of the k-reciprocal re-ranking spec documented
    in centroids_reid_tpu/ops/rerank.py (Zhong et al., CVPR 2017) — the
    oracle the vectorised TPU implementation is tested against. Every
    semantic choice (row-max distance normalisation, integer 2/3
    expansion test, exp(-dn) weights, L1-normalised V, Jaccard via
    min-sum) mirrors that module's docstring, written as plain Python
    sets and loops."""
    qf = np.asarray(qf, np.float32)
    gf = np.asarray(gf, np.float32)
    q, g = len(qf), len(gf)
    n = q + g
    f = np.concatenate([qf, gf])
    if dist == "euclidean":
        sq = (f * f).sum(1)
        d = sq[:, None] + sq[None, :] - 2.0 * (f @ f.T)
    elif dist == "cosine":
        fn = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        d = np.clip(np.abs(1.0 - fn @ fn.T), 1e-12, None)
    else:
        raise ValueError(dist)
    d = d.astype(np.float32)
    k1 = max(1, min(int(k1), n - 1))
    k2 = max(1, min(int(k2), n))
    kk, hk = k1 + 1, k1 // 2 + 1
    lam = float(lambda_value)

    dn = d / np.maximum(d.max(axis=1, keepdims=True), 1e-12)
    rank = np.argsort(d, axis=1, kind="stable")[:, :kk]
    rankh = rank[:, :hk]
    recip = np.zeros((n, kk), bool)
    reciph = np.zeros((n, hk), bool)
    for i in range(n):
        for s in range(kk):
            recip[i, s] = i in rank[rank[i, s]]
        for s in range(hk):
            reciph[i, s] = i in rankh[rankh[i, s]]

    v = np.zeros((n, n), np.float32)
    for i in range(n):
        r_i = {int(rank[i, s]) for s in range(kk) if recip[i, s]}
        r_star = set(r_i)
        for s in range(kk):
            if not recip[i, s]:
                continue
            j = int(rank[i, s])
            r_h = {int(rankh[j, t]) for t in range(hk) if reciph[j, t]}
            if 3 * len(r_h & r_i) > 2 * len(r_h):
                r_star |= r_h
        idxs = sorted(r_star)
        w = np.exp(-dn[i, idxs])
        v[i, idxs] = w / max(w.sum(), 1e-12)

    if k2 > 1:
        v = np.stack([v[rank[i, :k2]].mean(axis=0) for i in range(n)])

    vq, vg = v[:q], v[q:]
    jac = np.zeros((q, g), np.float32)
    for i in range(q):
        for j in range(g):
            mn = np.minimum(vq[i], vg[j]).sum()
            denom = max(vq[i].sum() + vg[j].sum() - mn, 1e-12)
            jac[i, j] = 1.0 - mn / denom
    return lam * dn[:q, q:] + (1.0 - lam) * jac
