"""Rank visualisation tests (grid output + centroid representatives)."""

import os

import numpy as np
import pytest
from PIL import Image

from centroids_reid_tpu.data.datasets import Record
from centroids_reid_tpu.metrics.visrank import (
    centroid_representatives,
    visualize_ranked_results,
)

cv2 = pytest.importorskip("cv2")


def _records(tmp_path, prefix, specs):
    """specs: list of (pid, camid)."""
    rng = np.random.RandomState(0)
    out = []
    for i, (pid, camid) in enumerate(specs):
        p = tmp_path / f"{prefix}_{i:03d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (32, 16, 3), np.uint8)
        ).save(p)
        out.append(Record(str(p), pid, camid, i))
    return out


def test_visualize_writes_grids(tmp_path):
    query = _records(tmp_path, "q", [(1, 0), (2, 1)])
    gallery = _records(
        tmp_path, "g", [(1, 1), (1, 0), (2, 0), (3, 1), (2, 2)]
    )
    distmat = np.random.RandomState(1).rand(2, 5)
    out_dir = str(tmp_path / "vis")
    visualize_ranked_results(
        distmat, query, gallery, out_dir, width=16, height=32, topk=3
    )
    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["q_000.png", "q_001.png"]
    img = cv2.imread(os.path.join(out_dir, "q_000.png"))
    assert img.shape == (32, 4 * 16 + 3 * 2 + 8, 3)


def test_centroid_representatives_counts(tmp_path):
    query = _records(tmp_path, "q", [(1, 0), (1, 2), (2, 0)])
    gallery = _records(
        tmp_path, "g", [(1, 0), (1, 1), (1, 2), (2, 1), (3, 0)]
    )
    # plain: one rep per gallery pid
    reps = centroid_representatives(query, gallery, respect_camids=False)
    assert [r[1] for r in reps] == [1, 2, 3]
    # camera-aware: pid 1 has query cams {0,2} -> combos {(1,2)},{(0,1)};
    # pid 2 has query cam {0} -> combo (1,); pid 3 has no query -> none
    reps = centroid_representatives(query, gallery, respect_camids=True)
    assert [(r[1], r[2]) for r in reps] == [
        (1, (1, 2)), (1, (0, 1)), (2, (1,)),
    ]
