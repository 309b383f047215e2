"""Rank visualisation: per-query PNG strips with green/red match borders.

Behavioural parity with /root/reference/utils/visrank.py:23-244:
* one grid per query: query image + top-k kept gallery images, green border
  for pid match, red otherwise; entries removed by the market protocol
  (same pid+camid, or camid-set membership in centroid mode) are skipped;
* centroid mode is approximated by picking a seeded-random member image per
  centroid, with the centroid's used-camid combination attached (:60-119);
* output file is ``<query image stem>.png`` in ``save_dir``, grid geometry
  GRID_SPACING=2, QUERY_EXTRA_SPACING=8, border width 3.
"""

from __future__ import annotations

import os
import random
from collections import defaultdict
from typing import List, Sequence

import numpy as np

from ..data.datasets import Record

GRID_SPACING = 2
QUERY_EXTRA_SPACING = 8
BW = 3
GREEN = (0, 255, 0)
RED = (0, 0, 255)


def centroid_representatives(
    query_records: Sequence[Record],
    gallery_records: Sequence[Record],
    respect_camids: bool,
    seed: int = 0,
) -> List[tuple]:
    """One representative (path, pid, camid-or-camid-tuple) per centroid."""
    rng = random.Random(seed)
    g_by_pid = defaultdict(list)
    for r in gallery_records:
        g_by_pid[r.pid].append(r)
    q_by_pid = defaultdict(list)
    for r in query_records:
        q_by_pid[r.pid].append(r)

    reps: List[tuple] = []
    for pid in sorted(g_by_pid):
        recs = g_by_pid[pid]
        cams_g = np.asarray([r.camid for r in recs])
        if respect_camids:
            combos = set()
            q_cams = sorted({r.camid for r in q_by_pid.get(pid, [])})
            for cur in q_cams:
                sel = np.nonzero(cams_g != cur)[0]
                if sel.size == 0:
                    continue
                used = tuple(sorted({int(c) for c in cams_g[sel]}))
                if used in combos:
                    continue
                combos.add(used)
                rep = recs[int(rng.choice(list(sel)))]
                reps.append((rep.path, pid, used))
        else:
            rep = rng.choice(recs)
            reps.append((rep.path, pid, (rep.camid,)))
    return reps


def visualize_ranked_results(
    distmat: np.ndarray,
    query_records: Sequence[Record],
    gallery_records: Sequence[Record],
    save_dir: str,
    width: int = 128,
    height: int = 256,
    topk: int = 10,
    use_centroids: bool = False,
    respect_camids: bool = False,
    max_number: int = 1_000_000,
):
    import cv2

    os.makedirs(save_dir, exist_ok=True)
    num_q = distmat.shape[0]

    if use_centroids:
        gallery = centroid_representatives(
            query_records, gallery_records, respect_camids
        )
    else:
        gallery = [(r.path, r.pid, (r.camid,)) for r in gallery_records]
    assert distmat.shape[1] == len(gallery), (
        f"distmat gallery dim {distmat.shape[1]} != {len(gallery)} entries"
    )

    indices = np.argsort(distmat, axis=1)

    def load_with_border(path, color):
        img = cv2.imread(path)
        img = cv2.resize(img, (width, height))
        img = cv2.copyMakeBorder(
            img, BW, BW, BW, BW, cv2.BORDER_CONSTANT, value=color
        )
        return cv2.resize(img, (width, height))

    for q_idx in range(num_q):
        q = query_records[q_idx]
        grid = 255 * np.ones(
            (
                height,
                (topk + 1) * width + topk * GRID_SPACING + QUERY_EXTRA_SPACING,
                3,
            ),
            np.uint8,
        )
        grid[:, :width] = load_with_border(q.path, (0, 0, 0))

        rank_idx = 1
        for g_idx in indices[q_idx]:
            g_path, g_pid, g_cams = gallery[g_idx]
            if respect_camids:
                invalid = (g_pid == q.pid) and (q.camid in g_cams)
            else:
                invalid = (g_pid == q.pid) and (q.camid == g_cams[0])
            if invalid:
                continue
            matched = g_pid == q.pid
            img = load_with_border(g_path, GREEN if matched else RED)
            start = rank_idx * (width + GRID_SPACING) + QUERY_EXTRA_SPACING
            grid[:, start:start + width] = img
            rank_idx += 1
            if rank_idx > topk:
                break

        stem = os.path.splitext(os.path.basename(q.path))[0]
        cv2.imwrite(os.path.join(save_dir, stem + ".png"), grid)
        if (q_idx + 1) % 100 == 0:
            print(f"- done {q_idx + 1}/{num_q}")
        if q_idx >= max_number:
            break

    print(f'Done. Images have been saved to "{save_dir}" ...')
