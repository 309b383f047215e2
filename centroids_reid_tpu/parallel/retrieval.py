"""Gallery-sharded retrieval over a device mesh.

The reference handles big galleries by chunking the distance matrix on the
host (utils/reid_metric.py:93-110). The TPU-native scale-out: shard gallery
rows over the mesh's ``gallery`` axis, compute a local top-k per device
(MXU matmul + lax.top_k), all-gather the n_devices*k candidates per query
(k*Q floats — tiny, rides ICI), and merge. No Q x G tensor ever exists,
on any chip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ..ops.retrieval import _hier_topk_build
# mesh.shard_map disables replication checking on both jax API
# generations — the local hierarchical selection needs it off (its
# intermediate values are unvarying over the gallery axis until the merge)
from .mesh import GALLERY_AXIS, shard_map


def shard_select_merge(qf_l, gf_l, gn_l, k_eff: int, shard_rows: int,
                       rescore=None):
    """The shard-local selection + global-merge protocol (runs INSIDE a
    shard_map over ``GALLERY_AXIS``), shared by ``sharded_topk`` and
    ``RetrievalService``'s sharded ranking:

    MXU dot against the local gallery rows -> hierarchical top-k_local
    (k_local = min(k, shard_rows)) -> optional ``rescore(val, idx) ->
    val`` hook (the service re-scores winners in exact fp32 against its
    LOCAL fp32 rows — no cross-chip gather) -> global row offset ->
    all-gather of the n*k_local candidates per query (the only ICI
    traffic) -> one small top-k merge. Exact because every global top-k
    row is inside its own shard's top-k at scoring resolution.
    """
    k_local = min(k_eff, shard_rows)
    dots = jax.lax.dot_general(
        qf_l, gf_l,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if qf_l.dtype == jnp.float32 else None),
    )
    val, idx = _hier_topk_build(gn_l - 2.0 * dots, k_local)
    if rescore is not None:
        val = rescore(val, idx)
    idx = idx + jax.lax.axis_index(GALLERY_AXIS) * shard_rows
    allv = jax.lax.all_gather(val, GALLERY_AXIS, axis=1, tiled=True)
    alli = jax.lax.all_gather(idx, GALLERY_AXIS, axis=1, tiled=True)
    nv, sel = jax.lax.top_k(-allv, k_eff)
    return -nv, jnp.take_along_axis(alli, sel, axis=1)


def make_sharded_row_gather(mesh: Mesh, shard_rows: int):
    """Cross-shard row gather: replicated ``[Q, R]`` GLOBAL row indices +
    gallery rows sharded on the mesh's gallery axis -> replicated
    ``[Q, R, D]`` fp32 rows.

    Each shard takes the indices that land in its local range (others
    contribute zero rows) and one ``psum`` over the gallery axis
    assembles the full gather — the TPU-native way to materialise
    arbitrary rows of a sharded matrix (the rows themselves must cross
    ICI; Q*R*D fp32 is the irreducible traffic). Used by the serving
    re-rank path (inference/service.py): the windowed k-reciprocal core
    needs its candidates' FEATURE rows, which on a sharded gallery live
    on whichever chip holds them.
    """

    def local(idx, gf_l):
        off = jax.lax.axis_index(GALLERY_AXIS) * shard_rows
        li = idx - off
        ok = (li >= 0) & (li < shard_rows)
        rows = jnp.take(gf_l, jnp.clip(li, 0, shard_rows - 1), axis=0)
        rows = jnp.where(ok[..., None], rows.astype(jnp.float32), 0.0)
        return jax.lax.psum(rows, GALLERY_AXIS)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(GALLERY_AXIS)),
        out_specs=P(),
    )


@functools.lru_cache(maxsize=64)
def _sharded_topk_program(mesh: Mesh, dist: str, g: int, shard_rows: int,
                          k_eff: int, pad: int):
    """Build + jit the per-shard selection program ONCE per
    (mesh, dist, shapes, k) — round 2 re-traced on every call
    (jax.jit(fn) inside the function body discarded the compiled callable).
    Mesh objects hash by devices+axis names, so the cache is stable across
    calls with the same mesh."""

    def local(qf_l, gf_l):
        gn = jnp.sum(
            gf_l.astype(jnp.float32) * gf_l.astype(jnp.float32), axis=1
        )[None, :]
        if pad:  # padded rows must never win
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, gn.shape, 1
            ) + jax.lax.axis_index(GALLERY_AXIS) * shard_rows
            gn = jnp.where(row_ids < g, gn, jnp.inf)
        if dist == "cosine":
            gn = jnp.where(jnp.isinf(gn), gn, 1.0)
        # a shard may hold fewer than k rows; the all-gather still yields
        # >= k_eff candidates because n * shard_rows >= G >= k_eff
        return shard_select_merge(qf_l, gf_l, gn, k_eff, shard_rows)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(GALLERY_AXIS)),
        out_specs=(P(), P()),
    ))


def sharded_topk(qf, gf, k: int, mesh: Mesh, dist: str = "euclidean"):
    """Top-k over a gallery sharded on ``mesh``'s gallery axis.

    qf [Q, D] replicated; gf [G, D] sharded on axis 0 (G padded to a
    multiple of the axis size). Returns (distances [Q, k], indices [Q, k])
    with the same distance flavour as ops.retrieval.topk_retrieval.
    """
    qf = jnp.asarray(qf)
    gf = jnp.asarray(gf)
    n = mesh.shape[GALLERY_AXIS]
    g = gf.shape[0]
    k_eff = min(k, g)

    pad = (-g) % n
    if pad:
        gf = jnp.concatenate(
            [gf, jnp.zeros((pad, gf.shape[1]), gf.dtype)], axis=0
        )
    shard_rows = gf.shape[0] // n

    if dist == "cosine":
        in_dtype = qf.dtype
        qf32 = qf.astype(jnp.float32)
        gf32 = gf.astype(jnp.float32)
        qn = jnp.maximum(jnp.linalg.norm(qf32, axis=1, keepdims=True), 1e-12)
        gnorm = jnp.maximum(jnp.linalg.norm(gf32, axis=1, keepdims=True), 1e-12)
        qf = (qf32 / qn).astype(in_dtype)
        gf = (gf32 / gnorm).astype(in_dtype)
    elif dist != "euclidean":
        raise ValueError(f"Unknown distance {dist!r}")

    fn = _sharded_topk_program(mesh, dist, g, shard_rows, k_eff, pad)
    qf_d = jax.device_put(qf, NamedSharding(mesh, P()))
    gf_d = jax.device_put(gf, NamedSharding(mesh, P(GALLERY_AXIS)))
    val, idx = fn(qf_d, gf_d)

    if dist == "cosine":
        sim = (1.0 - val) / 2.0
        val = jnp.clip(jnp.abs(1.0 - sim), min=1e-12)
    else:
        qn2 = jnp.sum(
            qf.astype(jnp.float32) * qf.astype(jnp.float32), axis=1
        )
        val = val + qn2[:, None]
    return np.asarray(val), np.asarray(idx)
