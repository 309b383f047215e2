"""Centroid Triplet Loss (CTL) — vectorised leave-one-instance-slot-out.

Reference semantics (/root/reference/train_ctl_model.py:79-148 plus
modelling/bases.py:359-384): the batch is P pids x K instance slots, pid-major.
For every slot ``i`` in 0..K-1:

* queries(i)   = slot-i instance of every pid (if that slot is real);
* centroid(i,c) = mean of pid c's *real* instances in slots != i,
  but the whole pid is dropped from round i when its slot i is mock
  (the ``t_re`` mask algebra, train_ctl_model.py:79-87);
* triplet loss is computed over concat(queries, centroids) with the pid
  labels duplicated (:123-124); invalid entries are filtered BEFORE hard
  mining (:117-122);
* round i is skipped when fewer than 2 pids are valid (:113-114);
* the final loss is the mean over non-skipped rounds (:142-145).

Derivation used here (provable from the reference masks): because the data
layer places mock samples at the tail of each pid's K slots
(datasets/bases.py:383-400) and guarantees >=2 real samples per pid
(:360-362), "pid c valid in round i" == "slot i of pid c is real", and a
valid pid always has >=1 real slot besides i. Hence validity v[i,c] =
is_real[c,i], and centroids are plain leave-one-out masked means.

Instead of a Python loop with boolean compaction (dynamic shapes — poison
for XLA), all K rounds are computed as one batched [K, 2P] masked triplet
problem via ``vmap``: static shapes, one fused kernel, K*2P x 2P distance
matrices on the MXU.

Divergence (documented): the reference additionally drops centroids whose
absolute sum is <= 1e-7 (:120-122) — a measure-zero event for real data —
we use the validity mask only.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .triplet import triplet_loss


def ctl_centroid_loss(
    features,
    labels,
    is_real,
    num_instances: int,
    margin: Optional[float] = 0.5,
    dist_func: str = "euclidean",
):
    """Returns dict(loss, dist_ap, dist_an, l2_mean_centroid, valid_rounds).

    features: [P*K, D] pid-major; labels: [P*K] int; is_real: [P*K] bool.
    ``loss`` is unweighted (CENTROID_CONTRASTIVE_WEIGHT applied by caller).
    """
    pk, d = features.shape
    k = num_instances
    p = pk // k
    f = features.reshape(p, k, d).astype(jnp.float32)
    r = is_real.reshape(p, k)
    pid_labels = labels.reshape(p, k)[:, 0]

    # Leave-one-out masked means: total-minus-slot, O(P*K*D).
    rf = jnp.where(r[..., None], f, 0.0)            # mask mock features
    tot_sum = jnp.sum(rf, axis=1)                   # [P, D]
    tot_cnt = jnp.sum(r, axis=1)                    # [P]
    loo_sum = tot_sum[None] - jnp.swapaxes(rf, 0, 1)        # [K, P, D]
    loo_cnt = tot_cnt[None] - r.T.astype(tot_cnt.dtype)     # [K, P]
    centroids = loo_sum / jnp.maximum(loo_cnt, 1)[..., None]

    queries = jnp.swapaxes(f, 0, 1)                 # [K, P, D]
    validity = r.T                                  # [K, P]

    def round_fn(q_i, c_i, v_i):
        emb = jnp.concatenate([q_i, c_i], axis=0)           # [2P, D]
        labs = jnp.concatenate([pid_labels, pid_labels])
        cand = jnp.concatenate([v_i, v_i])
        loss, dap, dan = triplet_loss(
            emb, labs, margin=margin, dist_func=dist_func,
            candidate_mask=cand,
        )
        denom = jnp.maximum(jnp.sum(cand), 1)
        dap_m = jnp.sum(jnp.where(cand, dap, 0.0)) / denom
        dan_m = jnp.sum(jnp.where(cand, jnp.where(jnp.isfinite(dan), dan, 0.0), 0.0)) / denom
        cdenom = jnp.maximum(jnp.sum(v_i), 1)
        l2 = jnp.sum(
            jnp.where(v_i, jnp.linalg.norm(c_i, axis=1), 0.0)
        ) / cdenom
        return loss, dap_m, dan_m, l2

    losses, daps, dans, l2s = jax.vmap(round_fn)(queries, centroids, validity)

    round_valid = jnp.sum(validity, axis=1) > 1     # [K]
    n_rounds = jnp.maximum(jnp.sum(round_valid), 1)

    def round_mean(x):
        return jnp.sum(jnp.where(round_valid, x, 0.0)) / n_rounds

    return {
        "loss": round_mean(losses),
        "dist_ap": round_mean(daps),
        "dist_an": round_mean(dans),
        "l2_mean_centroid": round_mean(l2s),
        "valid_rounds": jnp.sum(round_valid),
    }
