"""Fused distance-matrix + top-k retrieval (Pallas TPU kernel + XLA).

The reference's retrieval path materialises the full Q x G distance matrix
on the GPU, argsorts it on the host, and slices top-k
(/root/reference/inference/get_similar.py:112-119); large galleries are
chunked host-side (utils/reid_metric.py:93-110).

TPU design (round 2, k-independent): a Pallas kernel computes the fp32
score matrix tile-by-tile on the MXU (squared-euclidean reduced to
``||g||^2 - 2 q.g`` — the ``||q||^2`` term is rank-invariant per query);
selection then runs as a *hierarchical group-min* top-k (``_hier_topk``):
recursively take the k smallest of 8-column group minima (8x narrower per
level), gather the <= 8k surviving columns, finish with one small
``lax.top_k``. Exact in fp32 for any k, and the cost is a few bandwidth-
bound scans instead of k unrolled merge passes — the round-1 kernel's
limiter at k > 32 (the reference's own retrieval default is topk=100,
get_similar.py flag surface).

The round-1 streaming-merge kernel (``_topk_pallas``: running top-k in
VMEM, packed-key merge per gallery tile) is kept below: it never
materialises Q x G, which matters when HBM is tight, and it remains the
measured baseline in benchmarks/bench_retrieval.py.

Scoring dtype: fp32 inputs use an XLA HIGHEST-precision matmul (exact
reference parity; Mosaic fp32 matmuls are slow); bf16 inputs use the Pallas
score kernel with fp32 MXU accumulation (exact given bf16 inputs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_TILE = 128
# 1024 measured fastest on v5e (512: 1.55 ms, 1024: 1.46 ms at the 100k
# benchmark); 2048 exceeds the 16 MB scoped-VMEM limit (double-buffered
# [G_TILE, 2048] bf16 tiles).
_G_TILE = 1024
_INF = float("inf")  # plain float: jnp scalars would be captured consts in pallas
# cap on the materialised fp32 score buffer; queries are chunked beyond it
_SCORE_BUDGET_BYTES = 512 << 20


def _merge_topk(best_val, best_idx, scores, idx_base, k):
    """Merge a [QT, GT] score tile into the [QT, K] running top-k.

    Selection over the concatenated [QT, K + GT] buffer: K rounds of
    (min, one-hot mask). K is small and static; the buffer never leaves
    registers/VMEM.
    """
    qt, gt = scores.shape
    tile_idx = idx_base + jax.lax.broadcasted_iota(jnp.int32, (qt, gt), 1)
    buf = jnp.concatenate([best_val, scores], axis=1)
    ibuf = jnp.concatenate([best_idx, tile_idx], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, k + gt), 1)

    new_vals = []
    new_idxs = []
    for _ in range(k):
        m = jnp.min(buf, axis=1, keepdims=True)          # [QT, 1]
        a = jnp.argmin(buf, axis=1)                      # [QT]
        onehot = cols == a[:, None]
        new_vals.append(m[:, 0])
        new_idxs.append(jnp.sum(jnp.where(onehot, ibuf, 0), axis=1))
        buf = jnp.where(onehot, _INF, buf)
    return (
        jnp.stack(new_vals, axis=1),
        jnp.stack(new_idxs, axis=1).astype(jnp.int32),
    )


def _mono16(x_f32):
    """f32 -> int32 in [-32768, 32767], monotone under bf16 truncation.

    Standard IEEE trick on the bf16 bit pattern: negative floats get all
    bits flipped, non-negatives get the sign bit set, then the unsigned
    16-bit order matches the float order; subtract 0x8000 to center so the
    packed (key << 16 | col) comparison stays within int32.
    """
    from jax.experimental.pallas import tpu as pltpu

    b = pltpu.bitcast(x_f32.astype(jnp.bfloat16), jnp.int16)
    b = b.astype(jnp.int32) & 0xFFFF
    neg = (b & 0x8000) != 0
    u = jnp.where(neg, 0xFFFF - b, b | 0x8000)
    return u - 0x8000


def _unpack_value(u_centered):
    """Inverse of _mono16: int32 -> f32 (bf16-exact)."""
    from jax.experimental.pallas import tpu as pltpu

    u = u_centered + 0x8000
    b = jnp.where(u >= 0x8000, u - 0x8000, 0xFFFF - u)
    b2d = b.reshape(-1, 1).astype(jnp.int16)  # TPU bitcast needs >= 2D
    out = pltpu.bitcast(b2d, jnp.bfloat16).astype(jnp.float32)
    return out.reshape(b.shape)


def _merge_topk_packed(best_val, best_idx, scores, idx_base, k):
    """Packed-key merge: one big reduce per selection pass.

    Keys are ``mono16(score) << 16 | buffer_column`` — unique per column, so
    the min is unique (tie-safe: equal scores order by column, with previous
    best entries in columns 0..K-1 winning ties against tile entries, which
    preserves first-occurrence order across tiles). Selection order is at
    bf16 score resolution; the wrapper re-scores the winners exactly.
    """
    qt, gt = scores.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, k + gt), 1)
    buf_vals = jnp.concatenate([best_val, scores], axis=1)
    keys = (_mono16(buf_vals) << 16) | cols
    small_cols = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
    tile_idx0 = idx_base - k  # global idx of buffer column col>=K is idx_base+col-K

    new_vals, new_idxs = [], []
    for _ in range(k):
        m = jnp.min(keys, axis=1)                      # [QT] packed min
        u = m >> 16                                    # arithmetic shift = floor
        col = m - (u << 16)
        # previous-best columns (< K) need the old index; tile columns map
        # to idx_base + col - K directly
        prev = jnp.sum(
            jnp.where(small_cols == col[:, None], best_idx, 0), axis=1
        )
        new_idxs.append(jnp.where(col < k, prev, tile_idx0 + col))
        new_vals.append(_unpack_value(u))
        keys = jnp.where(keys == m[:, None], jnp.int32(0x7FFFFFFF), keys)
    return (
        jnp.stack(new_vals, axis=1),
        jnp.stack(new_idxs, axis=1).astype(jnp.int32),
    )


def _score_block_kernel(q_ref, g_ref, gn_ref, out_ref):
    """Fused score tile: ||g||^2 - 2 q.g on the MXU, fp32 accumulate."""
    dots = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = gn_ref[:] - 2.0 * dots


@jax.jit
def _scores_pallas(qf, gf, gn):
    """[Qp, D] x [Gp, D] -> fp32 scores [Qp, Gp] (Pallas, bf16 inputs)."""
    q, d = qf.shape
    g = gf.shape[0]
    grid = (q // _Q_TILE, g // _G_TILE)
    return pl.pallas_call(
        _score_block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Q_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _G_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_Q_TILE, _G_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, g), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * g * d,
            bytes_accessed=q * d * 2 + g * d * 2 + q * g * 4,
            transcendentals=0,
        ),
    )(qf, gf, gn)


@functools.partial(jax.jit, static_argnames=("precision",))
def _scores_xla(qf, gf, gn, precision=jax.lax.Precision.HIGHEST):
    """XLA score matrix (fp32 path: Mosaic fp32 matmuls are slow, XLA's
    are fine; HIGHEST keeps fp32-exact dot products for reference parity)."""
    dots = jax.lax.dot_general(
        qf, gf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return gn - 2.0 * dots


def _vmem_topk_kernel(x_ref, val_ref, idx_ref, *, k: int):
    """Exact fp32 top-k-smallest of a VMEM-resident [QT, W] block.

    k passes of (min, first-occurrence argmin, mask-out) over a loop-carried
    copy of the block — pure VPU work on on-chip data. Exactness: the min is
    fp32 (no packed bf16 truncation), and ties resolve to the lowest column
    (matching ``lax.top_k``'s positional tie-break). Measured ~2.5x cheaper
    than XLA's TopK on the [128, 12544] group-min matrix the hierarchical
    selection feeds it (XLA sorts; this does k scans)."""
    qt, w = x_ref.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, w), 1)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
    imax = jnp.int32(2**31 - 1)

    # results accumulate in loop carries (a dynamic single-lane ref store
    # needs 128-lane alignment Mosaic can't prove); one bulk store at the end
    def body(i, carry):
        b, vals, idxs = carry
        m = jnp.min(b, axis=1)
        a = jnp.min(jnp.where(b == m[:, None], cols, imax), axis=1)
        sel = kcols == i
        vals = jnp.where(sel, m[:, None], vals)
        idxs = jnp.where(sel, a[:, None], idxs)
        return jnp.where(cols == a[:, None], _INF, b), vals, idxs

    _, vals, idxs = jax.lax.fori_loop(
        0, k, body,
        (x_ref[:], jnp.full((qt, k), _INF, jnp.float32),
         jnp.zeros((qt, k), jnp.int32)),
        unroll=False,
    )
    val_ref[:] = vals
    idx_ref[:] = idxs


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _vmem_topk(scores, k: int, interpret: bool = False):
    """(values, indices) of the k smallest per row via _vmem_topk_kernel.

    Row tiles sized so block + loop carry stay within VMEM; W padded to a
    lane multiple with +inf."""
    q, w = scores.shape
    pad_w = (-w) % 128
    if pad_w:
        scores = jnp.concatenate(
            [scores, jnp.full((q, pad_w), _INF, scores.dtype)], axis=1
        )
        w += pad_w
    # budget: input block (double-buffered) + carry ~= 3 copies of the tile
    qt = min(128, max(8, ((4 << 20) // (w * 4)) // 8 * 8))
    pad_q = (-q) % qt
    if pad_q:
        scores = jnp.concatenate(
            [scores, jnp.zeros((pad_q, w), scores.dtype)], axis=0
        )
    val, idx = pl.pallas_call(
        functools.partial(_vmem_topk_kernel, k=k),
        grid=((q + pad_q) // qt,),
        in_specs=[
            pl.BlockSpec((qt, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((qt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q + pad_q, k), jnp.float32),
            jax.ShapeDtypeStruct((q + pad_q, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * q * w * k, bytes_accessed=q * w * 4 + q * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scores)
    return val[:q], idx[:q]


def _use_vmem_topk(w: int, k: int) -> bool:
    """Policy: the Pallas selection kernel applies on TPU backends when the
    row fits the VMEM tile budget. XLA's TopK keeps the job on CPU (tests,
    sharded CPU meshes) and for rows too wide to tile."""
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        tpu = False
    return tpu and w <= 32768 and k <= 1024


def _hier_topk_build(scores, k: int, use_pallas: bool = True):
    """Exact top-k-smallest via hierarchical group-min pruning.

    ``use_pallas=False`` pins the pure-XLA base case (skips the
    backend-gated ``_vmem_topk`` Pallas kernel): required when lowering
    for multiple platforms at once (``jax.export`` serving artifacts
    must not bake the trace-time backend decision into a cross-platform
    module).

    Invariant (proof in docstring of topk_retrieval): the k smallest
    elements of a row live inside the k groups (of 8 consecutive columns)
    with the k smallest group minima — if an element's group were outside,
    k whole groups would each hold a strictly-earlier-ranked element. So:
    recursively top-k the group-min vector (8x narrower per level), gather
    the ≤ 8k member columns, and finish with one small lax.top_k. Work is
    O(Q*W) elementwise mins + O(Q * 8k log) sorting — k-independent scans,
    no per-tile merge passes (the round-1 kernel's limiter at k > 32).
    """
    q, w = scores.shape
    # Base case measured on v5e (benchmarks/bench_retrieval.py): XLA's TopK
    # on [128, 12544] costs ~1 ms while each take_along_axis gather costs
    # ~1 ms regardless of width — so recurse only while a direct top_k is
    # pricier than one more (gather + small top_k) level. At 100k galleries
    # this means exactly one min level and ONE gather.
    if w <= max(16384, 8 * k):
        if use_pallas and _use_vmem_topk(w, k):
            return _vmem_topk(scores, k)
        v, i = jax.lax.top_k(-scores, k)
        return -v, i
    pad = (-w) % 8
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((q, pad), _INF, scores.dtype)], axis=1
        )
    w8 = scores.shape[1] // 8
    # STRIDED groups (group j = columns {j, j+w8, ..., j+7*w8}): the min
    # reduces over the middle axis of [Q, 8, w8], keeping the long axis in
    # lanes — a contiguous [.., 8] reduction would put 8 elements in a
    # 128-lane register (16x waste). Any disjoint 8-partition satisfies the
    # pruning proof.
    gm = jnp.min(scores.reshape(q, 8, w8), axis=1)
    _, gsel = _hier_topk_build(gm, k, use_pallas)          # [Q, k] group ids
    cols = (gsel[:, :, None]
            + w8 * jax.lax.broadcasted_iota(jnp.int32, (q, k, 8), 2))
    cols = cols.reshape(q, k * 8)
    vals = jnp.take_along_axis(scores, cols, axis=1)
    v, sel = jax.lax.top_k(-vals, k)
    return -v, jnp.take_along_axis(cols, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _hier_topk(scores, k: int):
    return _hier_topk_build(scores, k)


def _scores_pallas_maybe_interpret(qc, gf, gn_row, interpret: bool):
    if not interpret:
        return _scores_pallas(qc, gf, gn_row)
    # interpret mode (CPU tests): rebuild the call uncached with interpret
    q, d = qc.shape
    g = gf.shape[0]
    return pl.pallas_call(
        _score_block_kernel,
        grid=(q // _Q_TILE, g // _G_TILE),
        in_specs=[
            pl.BlockSpec((_Q_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _G_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_Q_TILE, _G_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, g), jnp.float32),
        interpret=True,
    )(qc, gf, gn_row)


def _retrieval_kernel(q_ref, g_ref, gn_ref, val_ref, idx_ref, *, k, packed):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        val_ref[:] = jnp.full_like(val_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]
    g = g_ref[:]
    # scores = ||g||^2 - 2 q.g ; fp32 accumulation on the MXU
    dots = jax.lax.dot_general(
        q, g,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = gn_ref[:] - 2.0 * dots

    merge = _merge_topk_packed if packed else _merge_topk
    new_val, new_idx = merge(val_ref[:], idx_ref[:], scores, j * _G_TILE, k)
    val_ref[:] = new_val
    idx_ref[:] = new_idx


@functools.partial(jax.jit, static_argnames=("k", "interpret", "packed"))
def _topk_pallas(qf, gf, gn, k: int, interpret: bool = False,
                 packed: bool = False):
    q, d = qf.shape
    g = gf.shape[0]
    grid = (pl.cdiv(q, _Q_TILE), pl.cdiv(g, _G_TILE))
    kernel = functools.partial(_retrieval_kernel, k=k, packed=packed)
    val, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Q_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _G_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_Q_TILE, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Q_TILE, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0] * _Q_TILE, k), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * _Q_TILE, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * g * d,
            bytes_accessed=q * d * 4 + g * d * 4 + q * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf, gf, gn)
    return val[:q], idx[:q]


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_xla(qf, gf, gn, k: int):
    """Chunked XLA fallback: same math via lax.top_k over gallery chunks."""
    q = qf.shape[0]
    g = gf.shape[0]
    chunk = min(8192, g)
    pad = (-g) % chunk
    if pad:
        gf = jnp.concatenate(
            [gf, jnp.zeros((pad, gf.shape[1]), gf.dtype)], axis=0
        )
        gn = jnp.concatenate(
            [gn, jnp.full((1, pad), _INF, jnp.float32)], axis=1
        )
        g = g + pad
    n_chunks = g // chunk

    def body(carry, c):
        best_val, best_idx = carry
        start = c * chunk
        gsl = jax.lax.dynamic_slice_in_dim(gf, start, chunk, 0)
        gnsl = jax.lax.dynamic_slice_in_dim(gn, start, chunk, 1)
        dots = jax.lax.dot_general(
            qf, gsl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = gnsl - 2.0 * dots
        idx = start + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        allv = jnp.concatenate([best_val, scores], axis=1)
        alli = jnp.concatenate([best_idx, idx], axis=1)
        nv, sel = jax.lax.top_k(-allv, k)
        ni = jnp.take_along_axis(alli, sel, axis=1)
        return (-nv, ni), None

    init = (
        jnp.full((q, k), _INF, jnp.float32),
        jnp.zeros((q, k), jnp.int32),
    )
    (val, idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return val, idx


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "use_pallas")
)
def topk_select(qf, gf, gn_row, k: int, *, interpret: bool = False,
                use_pallas: bool = True):
    """ONE selection entry for every consumer (CLI ``topk_retrieval``,
    ``RetrievalService``'s jitted query program, ``parallel.sharded_topk``'s
    per-shard body): [Qp, D] x [Gp, D] (+ gn_row [1, Gp]) -> top-k
    ``(scores [Qp, k], indices [Qp, k])`` by the raw score
    ``||g||^2 - 2 q.g`` (the rank-invariant ``||q||^2`` term is NOT added).

    VALUE contract caveat: only the ``indices`` are exact at the scoring
    dtype on every branch. The bf16 k<=32 branch returns PACKED-MERGE
    values — the raw score truncated to bf16 resolution (its packed
    mono16 key carries the gallery column in the low bits) — while the
    other branches return fp32 raw scores. Consumers must therefore
    re-derive distances from ``indices`` (exact re-score, as the service
    and ``topk_retrieval`` do) rather than finalise the returned values.

    Traceable (safe inside an enclosing jit). Dispatch policy (measured,
    benchmarks/bench_retrieval.py):

    * bf16 inputs, k <= 32  -> streaming-merge Pallas kernel (never
      materialises Q x G; fastest at small k);
    * bf16 inputs, k > 32   -> Pallas score kernel + hierarchical exact
      top-k (k-independent selection scans);
    * fp32 inputs           -> XLA HIGHEST score matmul (exact; Mosaic fp32
      matmuls are slow) + the same hierarchical selection.

    Shape contract: the Pallas paths need Qp % 128 == 0 and
    Gp % _G_TILE == 0 (gn_row's padded columns set to +inf); the fp32/XLA
    path accepts any shapes.
    """
    bf16 = qf.dtype == jnp.bfloat16 and use_pallas
    if bf16 and k <= 32:
        return _topk_pallas(qf, gf, gn_row, k, interpret=interpret,
                            packed=True)
    if bf16:
        scores = _scores_pallas_maybe_interpret(qf, gf, gn_row, interpret)
    else:
        scores = _scores_xla(qf, gf, gn_row)
    return _hier_topk_build(scores, k, use_pallas)


def topk_retrieval(
    qf,
    gf,
    k: int,
    dist: str = "euclidean",
    use_pallas: bool = True,
    interpret: bool = False,
    approx: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k nearest gallery entries per query.

    Returns (distances [Q,k], indices [Q,k]); distances match the
    reference's eval-flavour functions: squared euclidean without sqrt
    (reid_metric.py:25-33) or ``|1 - cos|`` (:51-59).

    Kernel policy (v5e, 100k x 2048 gallery, Q=128; see
    benchmarks/bench_retrieval.py for current numbers):
    * bf16 inputs -> Pallas score kernel + hierarchical exact top-k;
    * fp32 inputs + ``approx=True`` -> cast to bf16, same path (~1e-2
      relative score noise from the cast, can swap near-tied neighbours);
    * fp32 exact -> XLA HIGHEST-precision score matmul + the same
      hierarchical top-k (fp32 matmuls inside Mosaic are catastrophically
      slow, so Pallas is reserved for bf16).
    Any k is supported at full speed (selection work is k-independent
    scans; round 1's per-tile merge kernel degraded past k=32).

    Correctness of the hierarchical pruning: if a top-k element's 8-column
    group were NOT among the k groups with the k smallest minima, then k
    other groups would each contain an element ranked strictly before it
    (their minima), contradicting its top-k membership. Ties break toward
    lower column index at every level, which keeps the guarantee under
    duplicates (top_k breaks ties by position).
    """
    qf = jnp.asarray(qf)
    gf = jnp.asarray(gf)
    if approx and qf.dtype != jnp.bfloat16:
        qf = qf.astype(jnp.bfloat16)
        gf = gf.astype(jnp.bfloat16)
    if use_pallas and qf.dtype != jnp.bfloat16 and not interpret:
        # exact fp32: Mosaic fp32 matmuls are slow (multi-pass MXU
        # lowering); the XLA score matmul at HIGHEST precision is fast and
        # fp32-exact. Selection is shared (hierarchical) either way.
        use_pallas = False
    if dist == "cosine":
        in_dtype = qf.dtype
        qf32 = qf.astype(jnp.float32)
        gf32 = gf.astype(jnp.float32)
        qn = jnp.maximum(jnp.linalg.norm(qf32, axis=1, keepdims=True), 1e-12)
        gn_ = jnp.maximum(jnp.linalg.norm(gf32, axis=1, keepdims=True), 1e-12)
        qf = (qf32 / qn).astype(in_dtype)
        gf = (gf32 / gn_).astype(in_dtype)
        gnorm2 = jnp.ones((gf.shape[0],), jnp.float32)
    elif dist == "euclidean":
        gnorm2 = jnp.sum(
            gf.astype(jnp.float32) * gf.astype(jnp.float32), axis=1
        )
    else:
        raise ValueError(f"Unknown distance {dist!r}")

    g = gf.shape[0]
    k_eff = min(k, g)
    # pad gallery to tile multiple; padded entries get +inf scores
    pad_g = (-g) % _G_TILE
    if pad_g:
        gf = jnp.concatenate(
            [gf, jnp.zeros((pad_g, gf.shape[1]), gf.dtype)], axis=0
        )
        gnorm2 = jnp.concatenate(
            [gnorm2, jnp.full((pad_g,), _INF, jnp.float32)]
        )
    gn_row = gnorm2[None, :]

    q = qf.shape[0]
    gp = gf.shape[0]

    if use_pallas and qf.dtype == jnp.bfloat16 and k_eff <= 32:
        # small k: the round-1 streaming merge kernel wins (no Q x G score
        # buffer, ~1.9 ms vs ~2.7 ms hierarchical at k=10/100k-gallery);
        # selection at bf16 resolution, winners re-scored exactly below
        pad_q = (-q) % _Q_TILE
        qf_p = jnp.concatenate(
            [qf, jnp.zeros((pad_q, qf.shape[1]), qf.dtype)], axis=0
        ) if pad_q else qf
        val, idx = topk_select(qf_p, gf, gn_row, k_eff, interpret=interpret)
        val, idx = val[:q], idx[:q]
        g_sel = jnp.take(gf, idx, axis=0).astype(jnp.float32)
        gn_sel = jnp.take(gnorm2, idx, axis=0)
        dots = jnp.einsum("qd,qkd->qk", qf.astype(jnp.float32), g_sel)
        val = gn_sel - 2.0 * dots
        order = jnp.argsort(val, axis=1, stable=True)
        val = jnp.take_along_axis(val, order, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        return _finalize_distances(val, idx, qf, q, dist)

    # chunk queries so the fp32 score buffer stays bounded
    chunk = max(_Q_TILE, min(4096, (_SCORE_BUDGET_BYTES // (gp * 4))
                             // _Q_TILE * _Q_TILE))
    vals_c, idxs_c = [], []
    for start in range(0, q, chunk):
        qc = qf[start:start + chunk]
        rows = qc.shape[0]
        # pad to one static shape per run: full chunks when looping,
        # else the next _Q_TILE multiple
        target = chunk if q > chunk else -(-rows // _Q_TILE) * _Q_TILE
        pad_rows = target - rows
        if pad_rows:
            qc = jnp.concatenate(
                [qc, jnp.zeros((pad_rows, qc.shape[1]), qc.dtype)], axis=0
            )
        v, i = topk_select(
            qc, gf, gn_row, k_eff, interpret=interpret,
            use_pallas=use_pallas,
        )
        vals_c.append(v[:rows])
        idxs_c.append(i[:rows])
    val = jnp.concatenate(vals_c, axis=0)
    idx = jnp.concatenate(idxs_c, axis=0)
    return _finalize_distances(val, idx, qf, q, dist)


def _finalize_distances(val, idx, qf, q, dist):
    """Scores -> reference distance flavour (add back the rank-invariant
    ||q||^2 term / map to |1 - cos|)."""
    if dist == "cosine":
        sim = (1.0 - val) / 2.0
        val = jnp.clip(jnp.abs(1.0 - sim), min=1e-12)
    else:
        qnorm2 = jnp.sum(
            qf[:q].astype(jnp.float32) * qf[:q].astype(jnp.float32), axis=1
        )
        val = val + qnorm2[:, None]
    return np.asarray(val), np.asarray(idx)
