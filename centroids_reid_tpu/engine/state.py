"""Functional train state (replaces the Lightning module's mutable world)."""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..losses import init_centers
from ..models import init_model
from ..solver import build_optimizer


@struct.dataclass
class TrainState:
    params: Any           # {'model': flax params, 'centers': [C, D]}
    batch_stats: Any      # flax batch_stats collection
    opt_state: Any
    step: jnp.ndarray     # global optimizer step counter


def create_train_state(cfg, model, num_classes: int, seed: int = 0):
    """Initialise model + centers + optimizer. Returns (state, tx)."""
    rng = jax.random.PRNGKey(seed)
    rng_model, rng_centers = jax.random.split(rng)
    h, w = cfg.INPUT.SIZE_TRAIN
    params_model, batch_stats = init_model(model, rng_model, (h, w))
    emb = params_model["bnneck"]["scale"].shape[0]
    params = {
        "model": params_model,
        "centers": init_centers(rng_centers, num_classes, emb),
    }
    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx
