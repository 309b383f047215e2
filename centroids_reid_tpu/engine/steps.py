"""Jitted training steps for the CTL and baseline models.

One fused XLA program per optimizer step: backbone forward, all losses,
backward, both "optimizers" (optax multi-transform) — where the reference
runs a Python training_step with manual_backward and two opt.step() calls
(/root/reference/train_ctl_model.py:38-179, train_base_model.py:38-96).

Data-parallel semantics: the batch leads with a *group* axis [G, P*K, ...]
sharded over the mesh's data axis; the loss is vmapped per group, so
hard-example mining, centroid construction and BN batch statistics are all
group-local — exactly what each DDP rank sees in the reference. The mean
over groups reproduces DDP gradient averaging; XLA inserts the psum.

BNNeck subtlety: the reference computes BNNeck batch statistics over the
*real* rows only (it filters mocks before bn, train_ctl_model.py:69-74),
so we apply a masked BatchNorm1d here rather than the model's flax BN
(which is still used, with running stats, at eval). Masked semantics match
torch BatchNorm1d: biased variance for normalisation, unbiased for the
running-stat update, momentum 0.1.

Cross-group BN running-stats policy (DOCUMENTED DIVERGENCE): torch DDP
keeps *per-rank* running statistics and the saved checkpoint simply takes
rank 0's copy (torch BatchNorm momentum convention,
/root/reference/modelling/bases.py:83-84 — no SyncBatchNorm anywhere in the
reference). Here the per-group updated stats are averaged across groups
every step (loss_fn below): because each group's update is the affine
``(1-m)*running + m*stat_g`` of a SHARED running value, the mean over
groups equals ``(1-m)*running + m*mean_g(stat_g)`` — i.e. torch momentum
semantics applied to the group-averaged batch statistic. This is
deterministic, symmetric in the groups (no arbitrary rank-0 choice), and at
G=1 is bit-identical to the reference. Oracle-tested at G>1 in
tests/test_train_step.py::test_bn_running_stats_cross_group_policy.
"""

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..losses import (
    center_loss,
    cross_entropy_label_smooth,
    ctl_centroid_loss,
    triplet_loss,
)

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1  # torch convention: new = (1-m)*running + m*batch


def _masked_bnneck(feat, is_real, bn_params, bn_stats):
    """Masked BatchNorm1d (training mode) over the real rows.

    Returns (bn_out [N,D], new_stats dict). feat must be fp32.
    """
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    m = is_real[:, None]
    cnt = jnp.maximum(jnp.sum(is_real), 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(m, feat, 0.0), axis=0) / cnt
    centered = feat - mean
    var = jnp.sum(jnp.where(m, centered * centered, 0.0), axis=0) / cnt
    bn_out = centered * jax.lax.rsqrt(var + _BN_EPS) * scale + bias
    unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
    new_stats = {
        "mean": (1 - _BN_MOMENTUM) * bn_stats["mean"] + _BN_MOMENTUM * mean,
        "var": (1 - _BN_MOMENTUM) * bn_stats["var"] + _BN_MOMENTUM * unbiased,
    }
    return bn_out, new_stats


def make_train_step(model, tx, cfg, num_classes: int, mode: str) -> Callable:
    """mode: 'ctl' (centroid loss, mocks masked) or 'base' (plain)."""
    assert mode in ("ctl", "base")
    s = cfg.SOLVER
    k = cfg.DATALOADER.NUM_INSTANCE
    margin = s.MARGIN
    dist = s.DISTANCE_FUNC
    w_xent = s.QUERY_XENT_WEIGHT
    w_query = s.QUERY_CONTRASTIVE_WEIGHT
    w_centroid = s.CENTROID_CONTRASTIVE_WEIGHT
    w_center = s.CENTER_LOSS_WEIGHT

    def group_loss(params, batch_stats, imgs, labels, is_real):
        feat, mut = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            imgs,
            train=True,
            method=model.features,
            mutable=["batch_stats"],
        )
        feat = feat.astype(jnp.float32)

        bn_out, bnneck_stats = _masked_bnneck(
            feat,
            is_real if mode == "ctl" else jnp.ones_like(is_real),
            params["model"]["bnneck"],
            batch_stats["bnneck"],
        )
        logits = bn_out @ params["model"]["fc_query"]["kernel"].astype(
            jnp.float32
        )

        # Query-level triplet: mocks stay mining candidates, the mask only
        # drops anchors (triplet_loss.py:148-151).
        q_loss, q_ap, q_an = triplet_loss(
            feat, labels, margin=margin, dist_func=dist, anchor_mask=is_real
        )
        q_loss = q_loss * w_query

        xent_mask = is_real if mode == "ctl" else None
        xent = w_xent * cross_entropy_label_smooth(
            logits, labels, num_classes, mask=xent_mask
        )
        c_mask = is_real if mode == "ctl" else None
        c_loss = w_center * center_loss(
            feat, labels, params["centers"], mask=c_mask
        )

        metrics: Dict[str, Any] = {
            "query_triplet": q_loss,
            "query_xent": xent,
            "query_center": c_loss,
        }
        if mode == "ctl":
            ctl = ctl_centroid_loss(
                feat, labels, is_real, num_instances=k,
                margin=margin, dist_func=dist,
            )
            centroid = ctl["loss"] * w_centroid
            total = centroid + c_loss + xent + q_loss
            metrics.update(
                centroid_triplet=centroid,
                step_dist_ap=ctl["dist_ap"],
                step_dist_an=ctl["dist_an"],
                l2_mean_centroid=ctl["l2_mean_centroid"],
            )
        else:
            total = c_loss + xent + q_loss
            denom = jnp.maximum(jnp.sum(is_real), 1)
            metrics.update(
                step_dist_ap=jnp.sum(jnp.where(is_real, q_ap, 0.0)) / denom,
                step_dist_an=jnp.sum(jnp.where(is_real, q_an, 0.0)) / denom,
            )
        metrics["loss"] = total

        new_bstats = dict(batch_stats)
        new_bstats.update(mut["batch_stats"])
        new_bstats["bnneck"] = bnneck_stats
        return total, (metrics, new_bstats)

    def loss_fn(params, batch_stats, batch):
        totals, (metrics, new_bstats) = jax.vmap(
            group_loss, in_axes=(None, None, 0, 0, 0)
        )(params, batch_stats, batch["images"], batch["labels"], batch["is_real"])
        # Mean over groups == DDP gradient averaging.
        mean_total = jnp.mean(totals)
        metrics = jax.tree.map(jnp.mean, metrics)
        new_bstats = jax.tree.map(lambda x: jnp.mean(x, axis=0), new_bstats)
        return mean_total, (metrics, new_bstats)

    def train_step(state, batch):
        grads, (metrics, new_bstats) = jax.grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step
