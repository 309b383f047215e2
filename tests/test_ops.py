"""Retrieval kernel tests: pallas (interpret on CPU) vs XLA fallback vs numpy."""

import numpy as np
import pytest

from centroids_reid_tpu.ops import topk_retrieval


def _numpy_topk(qf, gf, k, dist):
    if dist == "euclidean":
        d = (
            (qf * qf).sum(1)[:, None]
            + (gf * gf).sum(1)[None, :]
            - 2 * qf @ gf.T
        )
    else:
        qn = qf / np.maximum(np.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
        gn = gf / np.maximum(np.linalg.norm(gf, axis=1, keepdims=True), 1e-12)
        d = np.clip(np.abs(1 - qn @ gn.T), 1e-12, None)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
@pytest.mark.parametrize("q,g,d", [(5, 100, 32), (130, 700, 64)])
def test_topk_xla_matches_numpy(dist, q, g, d):
    rng = np.random.RandomState(0)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    k = 10
    val, idx = topk_retrieval(qf, gf, k, dist=dist, use_pallas=False)
    rval, ridx = _numpy_topk(qf, gf, k, dist)
    np.testing.assert_allclose(val, rval, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(idx, ridx)


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_topk_pallas_interpret_matches_numpy(dist):
    rng = np.random.RandomState(1)
    qf = rng.randn(9, 32).astype(np.float32)
    gf = rng.randn(300, 32).astype(np.float32)
    k = 7
    val, idx = topk_retrieval(
        qf, gf, k, dist=dist, use_pallas=True, interpret=True
    )
    rval, ridx = _numpy_topk(qf, gf, k, dist)
    np.testing.assert_allclose(val, rval, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(idx, ridx)


def test_topk_k_larger_than_gallery():
    rng = np.random.RandomState(2)
    qf = rng.randn(3, 8).astype(np.float32)
    gf = rng.randn(5, 8).astype(np.float32)
    val, idx = topk_retrieval(qf, gf, 50, use_pallas=False)
    assert val.shape == (3, 5)
    rval, ridx = _numpy_topk(qf, gf, 5, "euclidean")
    np.testing.assert_array_equal(idx, ridx)


def test_topk_handles_duplicate_distances():
    """Duplicate gallery rows must both appear in top-k (no tie dropping)."""
    qf = np.zeros((1, 4), np.float32)
    gf = np.stack([
        np.ones(4), np.ones(4), 2 * np.ones(4), 3 * np.ones(4),
    ]).astype(np.float32)
    val, idx = topk_retrieval(
        qf, gf, 3, use_pallas=True, interpret=True
    )
    assert set(idx[0][:2].tolist()) == {0, 1}
    val2, idx2 = topk_retrieval(qf, gf, 3, use_pallas=False)
    np.testing.assert_allclose(np.sort(val[0]), np.sort(val2[0]), rtol=1e-6)


def test_topk_pallas_packed_merge_interpret():
    """bf16 packed-key merge: selection at bf16 resolution, exact re-scored
    distances, correct set up to bf16 near-ties."""
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    qf = rng.randn(5, 32).astype(np.float32)
    gf = rng.randn(300, 32).astype(np.float32)
    k = 7
    val, idx = topk_retrieval(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(gf, jnp.bfloat16),
        k, use_pallas=True, interpret=True,
    )
    # distances are exact (re-scored) for the returned indices (bf16 inputs)
    qf16 = np.asarray(jnp.asarray(qf, jnp.bfloat16), np.float32)
    gf16 = np.asarray(jnp.asarray(gf, jnp.bfloat16), np.float32)
    full = (
        (qf16 * qf16).sum(1)[:, None]
        + (gf16 * gf16).sum(1)[None, :]
        - 2 * qf16 @ gf16.T
    )
    np.testing.assert_allclose(
        val, np.take_along_axis(full, idx, axis=1), rtol=1e-3, atol=1e-3
    )
    # rows are sorted and the set matches the exact top-k within bf16 slack
    assert (np.diff(val, axis=1) >= -1e-6).all()
    kth_exact = np.sort(full, axis=1)[:, k - 1]
    assert (val[:, -1] <= kth_exact + 0.05 * np.abs(kth_exact) + 0.05).all()
