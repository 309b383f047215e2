"""Pairwise distance functions (pure, fp32 accumulation).

Parity targets:
* euclidean: sq-norm expansion, clamp(min=1e-12).sqrt()
  (/root/reference/losses/triplet_loss.py:27-41)
* cosine distance: |1 - cos_sim| clamped to >= eps
  (/root/reference/losses/triplet_loss.py:44-65)

Distances are always computed in float32 — eval forces .float() in the
reference (modelling/bases.py:280) and bf16 is too coarse for ranking.
The inner product is the MXU-heavy part; XLA fuses the norm terms.
"""

import jax.numpy as jnp


def euclidean_dist(x, y):
    """[m,d],[n,d] -> [m,n] euclidean distances."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    yy = jnp.sum(y * y, axis=1, keepdims=True)
    sq = xx + yy.T - 2.0 * (x @ y.T)
    return jnp.sqrt(jnp.clip(sq, min=1e-12))


def squared_euclidean_dist(x, y):
    """[m,d],[n,d] -> [m,n] squared euclidean (eval-metric flavour, no sqrt —
    matches utils/reid_metric.py:25-33 which never takes the root; argsort
    order is identical)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    yy = jnp.sum(y * y, axis=1, keepdims=True)
    return xx + yy.T - 2.0 * (x @ y.T)


def cosine_sim(x, y, eps: float = 1e-12):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), eps)
    yn = jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), eps)
    return (x / xn) @ (y / yn).T


def cosine_dist(x, y, eps: float = 1e-12):
    return jnp.clip(jnp.abs(1.0 - cosine_sim(x, y, eps)), min=eps)


_DIST_FUNCS = {
    "euclidean": euclidean_dist,
    "cosine": cosine_dist,
}

# Eval-time variants (reid_metric.py:25-68): euclidean without the sqrt.
_EVAL_DIST_FUNCS = {
    "euclidean": squared_euclidean_dist,
    "cosine": cosine_dist,
}


def get_dist_func(name: str = "euclidean", eval_mode: bool = False):
    table = _EVAL_DIST_FUNCS if eval_mode else _DIST_FUNCS
    if name not in table:
        raise ValueError(f"Unknown distance function {name!r}")
    return table[name]


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """Unit-norm rows (triplet_loss.py:16-24 adds eps to the norm)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (n + eps)
