"""Multi-device (virtual CPU mesh) tests for the parallel subsystem."""

import numpy as np
import pytest

import jax

from centroids_reid_tpu.ops import topk_retrieval
from centroids_reid_tpu.parallel import make_retrieval_mesh
from centroids_reid_tpu.parallel.retrieval import sharded_topk

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_mesh
@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_sharded_topk_matches_single_device(dist):
    rng = np.random.RandomState(0)
    qf = rng.randn(9, 32).astype(np.float32)
    gf = rng.randn(403, 32).astype(np.float32)  # not divisible by 8
    mesh = make_retrieval_mesh(8)
    val, idx = sharded_topk(qf, gf, 7, mesh, dist=dist)
    rval, ridx = topk_retrieval(qf, gf, 7, dist=dist, use_pallas=False)
    np.testing.assert_array_equal(idx, ridx)
    np.testing.assert_allclose(val, rval, rtol=1e-4, atol=1e-4)


@needs_mesh
def test_sharded_topk_k_exceeds_shard():
    """k larger than a single shard's rows still works."""
    rng = np.random.RandomState(1)
    qf = rng.randn(3, 8).astype(np.float32)
    gf = rng.randn(40, 8).astype(np.float32)  # 5 rows per shard < k=12
    mesh = make_retrieval_mesh(8)
    val, idx = sharded_topk(qf, gf, 12, mesh)
    rval, ridx = topk_retrieval(qf, gf, 12, use_pallas=False)
    np.testing.assert_array_equal(idx, ridx)
