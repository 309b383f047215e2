"""int8-quantized gallery retrieval (beyond parity: scalar-quantized
index, the TPU analogue of FAISS's SQ8 flat index).

The reference ships no quantized retrieval (its whole retrieval surface
is the fp32 distmat in /root/reference/inference/get_similar.py:112-119);
this is a production-scale addition on top of ops/retrieval.py's fused
kernels. What it buys, per v5e measurement (README benchmark notes):

* the SCORE pass is HBM-bound on the gallery read and int8 halves
  those bytes — measured 1.52x (0.364 ms vs bf16's 0.552 ms at
  100k x 2048, Q=128);
* END-TO-END latency stays at rough parity with the bf16 kernels,
  because the selection stage (k-pass VPU scans over score state) is
  dtype-independent and dominates past the score pass — int8 is NOT a
  latency lever on this part;
* the standing win is MEMORY: capacity mode (``gf32=None``) keeps the
  1-byte/elem codes as the ONLY resident gallery state — ~7M x 2048
  rows on one 16 GB chip vs ~2.6M for the exact bf16+fp32 pair, ~2x
  the bf16-only configuration — and exact mode (codes + fp32 rows,
  5 bytes/elem) keeps exact distances while dropping the bf16 copy.

Scheme — per-row symmetric int8 with exact re-score:

* ``quantize_gallery``: per-row scale ``s_r = max|row| / 127``,
  ``q8 = round(row / s_r)`` in [-127, 127]. gn is the squared norm of
  the DEQUANTIZED row (``s_r^2 ||q8||^2``), so selection scores are the
  true scores of the dequantized gallery — int8 is exactly
  representable in bf16 (8-bit integers fit bf16's 8 mantissa bits),
  and the MXU accumulates in fp32, so the ONLY approximation in the
  whole pipeline is the one rounding step ``row -> s_r q8``.
* selection: Pallas score kernel streams the int8 tile, converts to
  bf16 in VMEM, one MXU matmul per tile, then folds the row scale into
  the score: ``gn - 2 s_r (q . q8)``. Top-``sel`` candidates per query
  via the shared hierarchical selection (ops/retrieval.py).
* exact re-score: the ``sel`` (default ``default_margin(k)``) candidates are
  re-scored against the fp32 gallery rows and the final top-k is exact
  fp32 over them — quantization can only cost recall when a true top-k
  member is pushed below rank ``sel`` by rounding noise (per-element
  noise <= s_r/2, i.e. <0.4% of the row's max coordinate; measured
  recall vs exact fp32 is tracked in tests/test_retrieval_int8.py).

Distances returned are identical in flavour and dtype to
``ops.retrieval.topk_retrieval`` (squared euclidean without sqrt /
``|1 - cos|``), so consumers can switch per-index without changes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .retrieval import (
    _G_TILE,
    _INF,
    _Q_TILE,
    _SCORE_BUDGET_BYTES,
    _hier_topk_build,
    _finalize_distances,
)


class Int8Gallery(NamedTuple):
    """A scalar-quantized gallery index: ``codes`` int8 [G, D], per-row
    dequantization ``scale`` fp32 [G], and ``gn`` fp32 [G] — the squared
    norms of the dequantized rows (NOT the original rows: selection must
    rank the vectors it actually scores)."""

    codes: jax.Array
    scale: jax.Array
    gn: jax.Array

    @property
    def num_rows(self) -> int:
        return int(self.codes.shape[0])


@jax.jit
def quantize_gallery(gf) -> Int8Gallery:
    """Per-row symmetric int8 quantization of a [G, D] gallery."""
    gf32 = jnp.asarray(gf, jnp.float32)
    amax = jnp.max(jnp.abs(gf32), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(gf32 / scale), -127, 127).astype(jnp.int8)
    deq_gn = (scale[:, 0] ** 2) * jnp.sum(
        codes.astype(jnp.float32) ** 2, axis=1
    )
    return Int8Gallery(codes=codes, scale=scale[:, 0], gn=deq_gn)



def default_margin(k: int) -> int:
    """Default candidate margin: ``k + max(16, k // 4)`` — quantization
    noise displaces ranks locally (sub-1% score noise), so a fixed floor
    plus a small proportional slack recovers the true top-k (recall
    tests in tests/test_retrieval_int8.py); 2k margins were measured to
    waste ~40% of selection+re-score time at k=100 for no recall gain."""
    return k + max(16, k // 4)


def _score_block_kernel_i8(q_ref, g8_ref, s_ref, gn_ref, out_ref):
    """Fused int8-gallery score tile: ``gn - 2 s (q . q8)`` on the MXU.

    The int8 tile converts to bf16 in VMEM (exact: |code| <= 127 fits
    bf16's mantissa); accumulation is fp32; the per-row scale folds in
    AFTER the matmul, one multiply per output element."""
    g = g8_ref[:].astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        q_ref[:], g,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = gn_ref[:] - 2.0 * (s_ref[:] * dots)


def _scores_pallas_i8(qf, codes, s_row, gn_row, interpret: bool = False):
    """[Qp, D] bf16 x [Gp, D] int8 -> fp32 scores [Qp, Gp]."""
    q, d = qf.shape
    g = codes.shape[0]
    grid = (q // _Q_TILE, g // _G_TILE)
    return pl.pallas_call(
        _score_block_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Q_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _G_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _G_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_Q_TILE, _G_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, g), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * g * d,
            # the point of the kernel: gallery bytes are 1x, not 2x
            bytes_accessed=q * d * 2 + g * d + q * g * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf, codes, s_row, gn_row)


def _scores_xla_i8(qf, codes, s_row, gn_row):
    """XLA fallback (CPU suites / sharded CPU meshes / platforms without
    Mosaic): identical math — bf16-cast codes, fp32 accumulation, scale
    folded post-matmul."""
    dots = jax.lax.dot_general(
        qf, codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return gn_row - 2.0 * (s_row * dots)


@functools.partial(
    jax.jit, static_argnames=("k", "sel", "use_pallas", "interpret")
)
def topk_select_int8(qf, gal: Int8Gallery, gf32, k: int, *,
                     sel: int = 0, use_pallas: bool = True,
                     interpret: bool = False):
    """Traceable core: int8-scored candidate selection + exact fp32
    re-score -> exact-over-candidates top-k ``(raw scores, indices)``.

    ``qf`` [Q, D] (any float dtype; scored in bf16), ``gal`` the
    quantized index, ``gf32`` [G, D] fp32 rows for the re-score (the
    authoritative distances; only ``k`` x Q rows are ever gathered) —
    or ``None`` for CAPACITY mode: candidates re-score against their
    own DEQUANTIZED rows (``scale * codes``, computed per gathered
    candidate), so the only resident gallery state is the 1-byte/elem
    codes (+ scale/gn vectors); distances are then exact distances to
    the dequantized gallery (int8-resolution rows, fp32 arithmetic).
    ``sel`` is the candidate margin (0 -> ``default_margin(k)``); raising it
    trades a slightly longer re-score for recall under heavier
    quantization noise. Returns raw ``||g||^2 - 2 q.g`` scores like
    ``ops.retrieval.topk_select`` (the ||q||^2 term is rank-invariant).

    Shape contract matches the bf16 Pallas path: Q % 128 == 0 and
    G % _G_TILE == 0 for the kernel (pad codes with zeros and gn with
    +inf); the XLA path accepts any shapes. Callers that PAD ``gal``
    must pass ``sel`` clamped to the REAL row count (as
    ``topk_retrieval_int8`` and the service do) — the default margin is
    computed from the padded width and would otherwise pull +inf pad
    rows into the candidate gather.
    """
    g = gal.num_rows
    k_eff = min(int(k), g)
    n_sel = min(g, int(sel) if sel else default_margin(k_eff))

    qbf = qf.astype(jnp.bfloat16)
    s_row = gal.scale[None, :]
    gn_row = gal.gn[None, :]
    # Mosaic only lowers on TPU; CPU (tests, sharded CPU meshes) takes
    # the identical-math XLA fallback unless interpret mode is forced —
    # the same backend gate as ops.retrieval._use_vmem_topk
    if use_pallas and not interpret:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            use_pallas = False
    if use_pallas:
        scores = _scores_pallas_i8(qbf, gal.codes, s_row, gn_row,
                                   interpret=interpret)
    else:
        scores = _scores_xla_i8(qbf, gal.codes, s_row, gn_row)
    _, cand = _hier_topk_build(scores, n_sel, use_pallas)    # [Q, n_sel]

    # exact fp32 re-score of the candidate set; top-k over it
    if gf32 is None:
        # capacity mode: dequantize the gathered candidate rows — no
        # full-precision gallery copy exists anywhere
        rows = (
            jnp.take(gal.codes, cand, axis=0).astype(jnp.float32)
            * jnp.take(gal.scale, cand)[:, :, None]
        )
    else:
        rows = jnp.take(gf32, cand, axis=0)                  # [Q, n_sel, D]
    dots = jnp.einsum(
        "qd,qnd->qn", qf.astype(jnp.float32), rows,
        precision=jax.lax.Precision.HIGHEST,
    )
    gn_sel = jnp.sum(rows * rows, axis=2)
    exact = gn_sel - 2.0 * dots                              # [Q, n_sel]
    neg, sel_i = jax.lax.top_k(-exact, k_eff)
    return -neg, jnp.take_along_axis(cand, sel_i, axis=1)


def topk_retrieval_int8(
    qf,
    gal: Int8Gallery,
    gf32,
    k: int,
    dist: str = "euclidean",
    sel: int = 0,
    use_pallas: bool = True,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """``ops.retrieval.topk_retrieval`` over a quantized gallery index.

    Same output contract (reference-flavour distances, exact fp32 for
    the returned candidates); ``gal`` = ``quantize_gallery(gf)`` and
    ``gf32`` the fp32 rows (cosine: pass the NORMALIZED rows to both —
    quantize what you rank, exactly as the service normalizes before
    ranking), or ``gf32=None`` for capacity mode (winners re-score from
    their dequantized codes; distances are then exact distances to the
    dequantized gallery). Selection recall is governed by ``sel`` (see
    ``topk_select_int8``); distances of returned indices are exact for
    the rows the mode ranks.
    """
    qf = jnp.asarray(qf)
    if gf32 is not None:
        gf32 = jnp.asarray(gf32, jnp.float32)
    if dist == "cosine":
        qf32 = qf.astype(jnp.float32)
        qn = jnp.maximum(jnp.linalg.norm(qf32, axis=1, keepdims=True), 1e-12)
        qf = qf32 / qn
    elif dist != "euclidean":
        raise ValueError(f"Unknown distance {dist!r}")

    g = gal.num_rows
    k_eff = min(k, g)
    # clamp the margin to the REAL row count BEFORE padding: a margin
    # wider than the gallery would drag +inf-gn pad rows into the
    # candidate set, and their re-score gather against the unpadded
    # ``gf32`` would clamp to the last real row (duplicated indices)
    sel = min(g, int(sel) if sel else default_margin(k_eff))

    # pad gallery to the tile multiple (+inf gn keeps pads out of top-k)
    pad_g = (-g) % _G_TILE
    if pad_g and use_pallas:
        d = gal.codes.shape[1]
        gal = Int8Gallery(
            codes=jnp.concatenate(
                [gal.codes, jnp.zeros((pad_g, d), jnp.int8)], axis=0
            ),
            scale=jnp.concatenate(
                [gal.scale, jnp.ones((pad_g,), jnp.float32)]
            ),
            gn=jnp.concatenate(
                [gal.gn, jnp.full((pad_g,), _INF, jnp.float32)]
            ),
        )

    q = qf.shape[0]
    gp = gal.num_rows
    chunk = max(_Q_TILE, min(4096, (_SCORE_BUDGET_BYTES // (gp * 4))
                             // _Q_TILE * _Q_TILE))
    vals_c, idxs_c = [], []
    for start in range(0, q, chunk):
        qc = qf[start:start + chunk]
        rows = qc.shape[0]
        if use_pallas:
            target = chunk if q > chunk else -(-rows // _Q_TILE) * _Q_TILE
        else:
            target = rows
        pad_rows = target - rows
        if pad_rows:
            qc = jnp.concatenate(
                [qc, jnp.zeros((pad_rows, qc.shape[1]), qc.dtype)], axis=0
            )
        v, i = topk_select_int8(
            qc, gal, gf32, k_eff, sel=sel, use_pallas=use_pallas,
            interpret=interpret,
        )
        vals_c.append(v[:rows])
        idxs_c.append(i[:rows])
    val = jnp.concatenate(vals_c, axis=0)
    idx = jnp.concatenate(idxs_c, axis=0)
    return _finalize_distances(val, idx, qf, q, dist)
