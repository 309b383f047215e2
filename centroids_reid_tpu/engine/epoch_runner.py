"""Device-resident epoch executor: one scanned XLA program per epoch.

Pairs with data/device_data.py: the uint8 image bank lives in HBM; the
epoch's sampling plan (already materialised as static-shape index arrays)
is scanned — each step gathers its P x K images, augments on device, and
runs the fused train step. The host only submits one computation per epoch
and reads back the averaged metrics.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..data.transforms import augment_batch
from .steps import make_train_step


def make_epoch_runner(model, tx, cfg, num_classes: int, mode: str) -> Callable:
    train_step = make_train_step(model, tx, cfg, num_classes, mode)
    mean = tuple(cfg.INPUT.PIXEL_MEAN)
    std = tuple(cfg.INPUT.PIXEL_STD)
    size_hw = tuple(cfg.INPUT.SIZE_TRAIN)
    padding = cfg.INPUT.PADDING
    flip_p = cfg.INPUT.PROB
    re_p = cfg.INPUT.RE_PROB
    dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32

    @partial(jax.jit, donate_argnums=0)
    def run_epoch(state, image_bank, sample_idx, labels, is_real, step_valid,
                  key):
        """image_bank [N,H,W,3] u8; sample_idx/labels/is_real [S,G,PK];
        step_valid [S] bool (plans are padded to one static S so every
        epoch reuses the same compiled program; padded steps are skipped).
        Returns (state, metrics averaged over valid steps)."""
        steps = sample_idx.shape[0]
        keys = jax.random.split(key, steps)

        def real_step(state, idx_t, labels_t, real_t, key_t):
            imgs = jnp.take(image_bank, idx_t, axis=0)  # [G, PK, H, W, 3]
            x = augment_batch(
                imgs, real_t, key_t, size_hw, padding, mean, std,
                flip_p, re_p, dtype=dtype,
            )
            batch = {"images": x, "labels": labels_t, "is_real": real_t}
            return train_step(state, batch)

        # metrics structure, computed abstractly once for the skip branch
        metrics_shape = jax.eval_shape(
            real_step, state, sample_idx[0], labels[0], is_real[0], keys[0]
        )[1]

        def body(state, xs):
            idx_t, labels_t, real_t, valid_t, key_t = xs
            state, metrics = jax.lax.cond(
                valid_t,
                lambda s: real_step(s, idx_t, labels_t, real_t, key_t),
                lambda s: (
                    s,
                    jax.tree.map(
                        lambda sh: jnp.zeros(sh.shape, sh.dtype),
                        metrics_shape,
                    ),
                ),
                state,
            )
            return state, metrics

        state, metrics = jax.lax.scan(
            body, state, (sample_idx, labels, is_real, step_valid, keys)
        )
        n_valid = jnp.maximum(jnp.sum(step_valid), 1)
        return state, jax.tree.map(
            lambda m: jnp.sum(m, axis=0) / n_valid, metrics
        )

    return run_epoch
