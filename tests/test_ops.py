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


def test_topk_k100_hierarchical_matches_numpy():
    """k=100 (the reference retrieval CLI default) through the multi-level
    hierarchical selection: 20000 -> 2500 -> 313 -> direct top_k."""
    rng = np.random.RandomState(4)
    qf = rng.randn(7, 16).astype(np.float32)
    gf = rng.randn(20000, 16).astype(np.float32)
    k = 100
    val, idx = topk_retrieval(qf, gf, k, use_pallas=False)
    rval, ridx = _numpy_topk(qf, gf, k, "euclidean")
    np.testing.assert_allclose(val, rval, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(idx, ridx)


def test_topk_query_chunking(monkeypatch):
    """Queries are processed in bounded chunks; results match unchunked."""
    import centroids_reid_tpu.ops.retrieval as R

    rng = np.random.RandomState(5)
    qf = rng.randn(300, 16).astype(np.float32)
    gf = rng.randn(600, 16).astype(np.float32)
    # gallery pads to 1024 -> 4 KB/row; force a 128-row chunk
    monkeypatch.setattr(R, "_SCORE_BUDGET_BYTES", 128 * 1024 * 4)
    val, idx = R.topk_retrieval(qf, gf, 13, use_pallas=False)
    rval, ridx = _numpy_topk(qf, gf, 13, "euclidean")
    np.testing.assert_allclose(val, rval, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(idx, ridx)


def test_hier_topk_levels_and_ties():
    """_hier_topk against numpy over widths spanning 1..3 levels, incl. a
    constant row (all ties) and +inf padding columns."""
    from centroids_reid_tpu.ops.retrieval import _hier_topk

    rng = np.random.RandomState(6)
    for w in (64, 1025, 9000, 70000):
        x = rng.randn(3, w).astype(np.float32)
        x[1, :] = 1.0  # full tie row
        if w > 100:
            x[2, -50:] = np.inf
        for k in (1, 5, 100):
            k_eff = min(k, w)
            v, i = _hier_topk(np.asarray(x), k_eff)
            v, i = np.asarray(v), np.asarray(i)
            order = np.argsort(x, axis=1, kind="stable")[:, :k_eff]
            np.testing.assert_allclose(
                v, np.take_along_axis(x, order, axis=1), rtol=1e-6
            )
            # indices must retrieve the same multiset of values
            np.testing.assert_allclose(
                np.take_along_axis(x, i, axis=1), v, rtol=1e-6
            )
            assert (np.diff(v, axis=1) >= 0).all()


def test_vmem_topk_interpret_matches_lax_topk():
    """Oracle for the TPU-only _vmem_topk Pallas selection kernel
    (interpret mode — the backend gate keeps it off the CPU suite).

    Covers: k-pass min/argmin selection, first-occurrence (lowest-column)
    tie-break matching lax.top_k, +inf columns never selected, row tiling
    (q not a tile multiple) and lane padding (w % 128 != 0)."""
    import jax
    import jax.numpy as jnp

    from centroids_reid_tpu.ops.retrieval import _vmem_topk

    rng = np.random.RandomState(7)
    for q, w in ((3, 100), (17, 1000), (9, 128)):
        x = rng.randn(q, w).astype(np.float32)
        x[0, :] = 2.0                      # full tie row
        if w > 10:
            x[-1, -7:] = np.inf            # inf columns must lose
            dup = x[1, 3]
            x[1, 5] = dup                  # duplicated value, two columns
        for k in (1, 4, 32):
            k_eff = min(k, w)
            v, i = _vmem_topk(jnp.asarray(x), k_eff, interpret=True)
            rv, ri = jax.lax.top_k(-jnp.asarray(x), k_eff)
            np.testing.assert_allclose(np.asarray(v), -np.asarray(rv),
                                       rtol=0, atol=0)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


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


def test_topk_select_contract_raw_scores():
    """topk_select (the ONE selection entry shared by the CLI, the serving
    program and the sharded path) returns raw ``||g||^2 - 2 q.g`` scores
    whose order and indices match the numpy oracle at the reference's
    canonical serving depth k=100."""
    import jax.numpy as jnp

    from centroids_reid_tpu.ops.retrieval import topk_select

    rng = np.random.RandomState(11)
    q, g, d, k = 16, 3000, 64, 100
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    gn = (gf * gf).sum(1)[None, :]
    v, i = topk_select(
        jnp.asarray(qf), jnp.asarray(gf), jnp.asarray(gn), k,
        use_pallas=False,
    )
    rval, ridx = _numpy_topk(qf, gf, k, "euclidean")
    np.testing.assert_array_equal(np.asarray(i), ridx)
    # raw scores + ||q||^2 == euclidean eval-flavour distances
    np.testing.assert_allclose(
        np.asarray(v) + (qf * qf).sum(1)[:, None], rval,
        rtol=1e-4, atol=1e-4,
    )
