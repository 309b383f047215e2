"""Label-smoothed cross entropy and center loss (pure functions).

Parity targets:
* CrossEntropyLabelSmooth (/root/reference/losses/triplet_loss.py:176-205):
  epsilon=0.1, targets (1-eps)*onehot + eps/K, loss = mean over batch of
  sum over classes of -t*log_softmax. The reference pre-filters real
  samples (train_ctl_model.py:69-76); we pass a validity mask instead and
  divide by the count of valid rows.
* CenterLoss (/root/reference/losses/center_loss.py:26-46): squared
  euclidean distance to the own-class center, clamped [1e-12, 1e12],
  summed and divided by batch size (= number of real samples). The
  reference materialises an NxC distance matrix then masks the label
  column; mathematically only ||x_i - c_{y_i}||^2 survives, so we gather —
  identical value and gradient, O(N*D) instead of O(N*C*D).
"""

import jax
import jax.numpy as jnp


def cross_entropy_label_smooth(
    logits, labels, num_classes: int, epsilon: float = 0.1, mask=None
):
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    targets = (1.0 - epsilon) * onehot + epsilon / num_classes
    per_row = -jnp.sum(targets * log_probs, axis=1)
    if mask is None:
        return jnp.mean(per_row)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / denom


def center_loss(feats, labels, centers, mask=None):
    """feats [N,D], labels [N] int, centers [C,D] (learnable parameter).

    Returns the scalar loss; the center parameter is trained by its own
    SGD transform (see solver/build.py), with gradients rescaled by
    1/CENTER_LOSS_WEIGHT as in train_ctl_model.py:157-159.
    """
    feats = feats.astype(jnp.float32)
    own = centers.astype(jnp.float32)[labels]
    sq = jnp.sum((feats - own) ** 2, axis=1)
    sq = jnp.clip(sq, 1e-12, 1e12)
    if mask is None:
        return jnp.mean(sq)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, sq, 0.0)) / denom


def init_centers(rng, num_classes: int, feat_dim: int):
    """Standard-normal init, matching torch.randn (center_loss.py:22-24)."""
    return jax.random.normal(rng, (num_classes, feat_dim), jnp.float32)
