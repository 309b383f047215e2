"""Loss parity tests against explicit-loop torch oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    oracle_center_loss,
    oracle_ctl_loss,
    oracle_triplet,
    oracle_xent_smooth,
)

from centroids_reid_tpu.losses import (  # noqa: E402
    center_loss,
    cross_entropy_label_smooth,
    ctl_centroid_loss,
    euclidean_dist,
    cosine_dist,
    triplet_loss,
)


def _pk_batch(p=5, k=4, d=16, seed=0, real_counts=None):
    """Build a pid-major P x K batch respecting the data-layer invariants:
    mocks at the tail of each pid's slots, >= 2 real per pid
    (datasets/bases.py:360-400)."""
    rng = np.random.RandomState(seed)
    feats = rng.randn(p * k, d).astype(np.float32)
    labels = np.repeat(np.arange(p), k)
    is_real = np.ones(p * k, bool)
    if real_counts is not None:
        for c, n_real in enumerate(real_counts):
            is_real[c * k + n_real: (c + 1) * k] = False
            # mock features are backbone(zero-image), nonzero garbage:
            feats[c * k + n_real: (c + 1) * k] = rng.randn(k - n_real, d) * 3
    return feats, labels, is_real


@pytest.mark.parametrize("dist", ["euclidean", "cosine"])
def test_distances_match_oracle(dist):
    rng = np.random.RandomState(0)
    x = rng.randn(7, 12).astype(np.float32)
    y = rng.randn(9, 12).astype(np.float32)
    ours = euclidean_dist(x, y) if dist == "euclidean" else cosine_dist(x, y)
    from torch_oracle import oracle_euclidean, oracle_cosine_dist

    fn = oracle_euclidean if dist == "euclidean" else oracle_cosine_dist
    ref = fn(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("margin", [0.5, None])
def test_triplet_matches_oracle(margin):
    feats, labels, _ = _pk_batch(p=4, k=4, seed=1)
    loss, ap, an = triplet_loss(feats, labels, margin=margin)
    rl, rap, ran = oracle_triplet(
        torch.from_numpy(feats), torch.from_numpy(labels), margin=margin
    )
    np.testing.assert_allclose(float(loss), float(rl), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ap), rap.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(an), ran.numpy(), rtol=1e-5)


def test_triplet_mask_after_mining():
    """Mock samples still act as mining candidates for real anchors
    (triplet_loss.py:148-151 applies the mask only to anchors)."""
    feats, labels, is_real = _pk_batch(p=4, k=4, seed=2, real_counts=[4, 2, 3, 4])
    loss, _, _ = triplet_loss(feats, labels, margin=0.5, anchor_mask=is_real)
    rl, _, _ = oracle_triplet(
        torch.from_numpy(feats),
        torch.from_numpy(labels),
        margin=0.5,
        mask=torch.from_numpy(is_real),
    )
    np.testing.assert_allclose(float(loss), float(rl), rtol=1e-5)

    # and it must differ from pre-mining filtering (candidate_mask)
    loss_pre, _, _ = triplet_loss(
        feats, labels, margin=0.5, candidate_mask=jnp.asarray(is_real)
    )
    assert abs(float(loss_pre) - float(rl)) > 1e-6


@pytest.mark.parametrize(
    "real_counts",
    [
        None,                     # all real
        [4, 2, 3, 4, 2],          # uneven pids
        [2, 2, 2, 2, 2],          # rounds 2,3 fully skipped
        [4, 4, 2, 2, 2],          # rounds 2,3 have exactly 2 valid pids
        [3, 2, 2, 2, 2],          # round 2 has 1 valid pid -> skipped
    ],
)
def test_ctl_centroid_loss_matches_oracle(real_counts):
    k = 4
    feats, labels, is_real = _pk_batch(p=5, k=k, seed=3, real_counts=real_counts)
    ours = ctl_centroid_loss(feats, labels, is_real, num_instances=k, margin=0.5)
    ref = oracle_ctl_loss(
        torch.from_numpy(feats),
        torch.from_numpy(labels),
        torch.from_numpy(is_real),
        k,
        margin=0.5,
    )
    assert int(ours["valid_rounds"]) == ref["valid_rounds"]
    for key in ("loss", "dist_ap", "dist_an", "l2_mean_centroid"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref[key]), rtol=1e-4, atol=1e-5,
            err_msg=f"{key} mismatch for real_counts={real_counts}",
        )


def test_xent_label_smooth_matches_oracle():
    rng = np.random.RandomState(4)
    logits = rng.randn(10, 7).astype(np.float32)
    targets = rng.randint(0, 7, 10)
    ours = cross_entropy_label_smooth(logits, targets, num_classes=7)
    ref = oracle_xent_smooth(
        torch.from_numpy(logits), torch.from_numpy(targets), 7
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    # masked variant == oracle on the filtered subset
    mask = np.array([True] * 6 + [False] * 4)
    ours_m = cross_entropy_label_smooth(
        logits, targets, num_classes=7, mask=jnp.asarray(mask)
    )
    ref_m = oracle_xent_smooth(
        torch.from_numpy(logits[mask]), torch.from_numpy(targets[mask]), 7
    )
    np.testing.assert_allclose(float(ours_m), float(ref_m), rtol=1e-5)


def test_center_loss_matches_oracle():
    rng = np.random.RandomState(5)
    x = rng.randn(8, 16).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    centers = rng.randn(5, 16).astype(np.float32)
    ours = center_loss(x, labels, centers)
    ref = oracle_center_loss(
        torch.from_numpy(x), torch.from_numpy(labels), torch.from_numpy(centers)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    mask = np.array([True] * 5 + [False] * 3)
    ours_m = center_loss(x, labels, centers, mask=jnp.asarray(mask))
    ref_m = oracle_center_loss(
        torch.from_numpy(x[mask]),
        torch.from_numpy(labels[mask]),
        torch.from_numpy(centers),
    )
    np.testing.assert_allclose(float(ours_m), float(ref_m), rtol=1e-5)


def test_center_loss_gradient_flows_to_centers():
    import jax

    rng = np.random.RandomState(6)
    x = rng.randn(8, 16).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    centers = rng.randn(5, 16).astype(np.float32)
    g = jax.grad(lambda c: center_loss(x, labels, c))(jnp.asarray(centers))
    # only centers of present labels receive gradient
    present = np.unique(labels)
    gn = np.linalg.norm(np.asarray(g), axis=1)
    assert (gn[present] > 0).all()
    absent = [c for c in range(5) if c not in present]
    for c in absent:
        assert gn[c] == 0
