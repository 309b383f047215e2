"""Batch-hard triplet loss with masking, as a pure function.

Reference semantics (/root/reference/losses/triplet_loss.py):

* hard mining (:68-119): per anchor, max distance over same-label
  (positives, self included) and min over different-label (negatives);
* margin: MarginRankingLoss(margin) -> mean(relu(d_ap - d_an + margin));
  margin=None -> SoftMarginLoss -> mean(softplus(d_ap - d_an)) (:129-132,153-156);
* **the ``mask`` argument is applied AFTER mining** (:148-151): padded mock
  samples still act as mining candidates for real anchors; only the anchor
  rows are dropped from the loss mean. We replicate that exactly via
  ``anchor_mask``.
* the CTL centroid loss instead filters invalid entries BEFORE mining
  (train_ctl_model.py:117-124); that is expressed with ``candidate_mask``
  (invalid entries are neither anchors nor candidates).

Everything is static-shape: masks select, nothing reshapes.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .distances import get_dist_func

_NEG_INF = -jnp.inf
_POS_INF = jnp.inf


def batch_hard_mine(dist, labels, candidate_mask=None):
    """Hardest positive / negative distance per anchor.

    dist: [N,N] pairwise distances; labels: [N]; candidate_mask: [N] bool,
    entries outside the mask are never selected as positive or negative.
    Returns (dist_ap, dist_an), each [N].
    """
    same = labels[:, None] == labels[None, :]
    is_pos = same
    is_neg = ~same
    if candidate_mask is not None:
        is_pos = is_pos & candidate_mask[None, :]
        is_neg = is_neg & candidate_mask[None, :]
    dist_ap = jnp.max(jnp.where(is_pos, dist, _NEG_INF), axis=1)
    dist_an = jnp.min(jnp.where(is_neg, dist, _POS_INF), axis=1)
    return dist_ap, dist_an


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def triplet_loss(
    feats,
    labels,
    margin: Optional[float] = 0.5,
    dist_func: str = "euclidean",
    anchor_mask=None,
    candidate_mask=None,
    normalize_feature: bool = False,
):
    """Batch-hard triplet loss.

    Returns (loss, dist_ap, dist_an) like the reference __call__ (:173);
    dist_ap/dist_an are per-anchor vectors (invalid anchors hold junk —
    use the masks when reducing them for logging).
    """
    if normalize_feature:
        from .distances import l2_normalize

        feats = l2_normalize(feats)
    dist = get_dist_func(dist_func)(feats, feats)
    dist_ap, dist_an = batch_hard_mine(dist, labels, candidate_mask)

    valid = anchor_mask
    if candidate_mask is not None:
        valid = candidate_mask if valid is None else (valid & candidate_mask)

    # Guard infinities from fully-masked rows before arithmetic.
    if valid is not None:
        safe_ap = jnp.where(valid, dist_ap, 0.0)
        safe_an = jnp.where(valid, dist_an, 1.0)
    else:
        safe_ap, safe_an = dist_ap, dist_an

    if margin is not None:
        per_anchor = jax.nn.relu(safe_ap - safe_an + margin)
    else:
        per_anchor = jax.nn.softplus(safe_ap - safe_an)
    loss = _masked_mean(per_anchor, valid)
    return loss, dist_ap, dist_an
