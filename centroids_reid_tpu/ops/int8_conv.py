"""Fused int8 conv + requantization Pallas kernels for the PTQ serving path.

STATUS: correct and tested, but measured SLOWER than the XLA fallback on
v5e for the full ResNet-50 embed program (15.5k vs 22.4k imgs/s), so
models/quantized.py defaults to ``use_pallas=False``. The measurement
story, kept here because it is instructive:

* Motivation: XLA:TPU does not fuse elementwise epilogues into Mosaic
  conv/matmul outputs, so the quantized graph materialises every conv's
  int32 accumulator in HBM before a separate `clamp_convert` pass writes
  the int8 tensor — those requant passes are ~2/3 of the XLA program's
  device time. These kernels keep the accumulator in VMEM and write int8
  directly, eliminating that traffic.
* Reality: per-op profiling shows the individual kernels DO beat their
  XLA conv+clamp pairs on the large early-layer shapes, but the custom-
  call boundaries cost more than the kernels save — XLA inserts layout
  copies around the calls (~3 ms/рep) and loses cross-op scheduling,
  and Mosaic's int8 matmul underutilises the MXU at K=64/N=256 shapes
  (26 TOPS vs 213 at K=512/N=2048). Net: the whole-program XLA path wins.
* Epilogue ops are not created equal in Mosaic: `jnp.round` and direct
  int32->int8 converts are multi-op (the +-0.5-truncate formulation below
  is ~2x faster); XLA meanwhile pattern-matches `clip(round(x/s))` into a
  fast quantize lowering — see the NOTE in models/quantized.py.

Kernels:

* :func:`matmul_requant` — [M,K]x[K,N] int8 MXU matmul with the full serving
  epilogue: per-channel fp32 scale+bias, optional int8 residual add,
  optional ReLU, round/clip to int8. 1x1 convs lower to this directly
  (stride-2 1x1 convs after a host-side row slice).
* :func:`conv3x3_requant` — stride-1 3x3 conv as 9 shifted MXU taps
  accumulated in VMEM. Rows are flattened (b, h, w); a tap (dh, dw) is a
  row-roll by dh*W+dw with a static boundary mask (tiles are whole images,
  so rolls never mix images: the wrapped rows are exactly the padding
  positions the mask zeroes).

Everything else (the 7x7 stem, stride-2 3x3 convs — 2 of 53 convs in
ResNet-50) stays on the XLA fallback path in models/quantized.py.

Epilogue math matches the XLA engine: with folded scales
``g[c] = s_in*s_w[c]/s_out``, ``t = acc*g + b/s_out (+ res*s_res/s_out)``,
optional ``max(t, 0)``, then ``clip(round(t), -127, 127)`` — ReLU commutes
with the positive scale, so this equals quantize(relu(dequant)). int8
equality vs the unfused reference is asserted by tests/test_int8_conv.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per grid step. Mosaic keeps every named
# intermediate resident (the rolled/masked tap copies, the int32
# accumulator, the fp32 epilogue stage, double-buffered IO), so tiles are
# sized against an estimate of bytes-per-row, not just the accumulator.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_tile(m: int, unit: int, row_bytes: int) -> int:
    """Rows per grid step: a multiple of ``unit`` dividing ``m``, with
    tile * row_bytes within the VMEM budget.

    The minimum tile is ``unit`` rows (one indivisible work item: 8-row
    alignment for matmuls, one whole image for conv3x3); if even that
    exceeds the budget the caller's shapes cannot be tiled here — fail
    loudly instead of handing Mosaic a block that spills or refuses to
    compile."""
    target = max(1, _VMEM_BUDGET // max(row_bytes, 1))
    if unit > target:
        raise ValueError(
            f"int8 kernel tile of {unit} rows x {row_bytes} B/row exceeds "
            f"the {_VMEM_BUDGET >> 20} MB VMEM budget; use the XLA "
            f"fallback (use_pallas=False) for this shape"
        )
    tile = unit
    while tile * 2 <= target and m % (tile * 2) == 0 and tile * 2 <= m:
        tile *= 2
    return tile


def _epilogue(acc_i32, scale_ref, bias_ref, relu: bool, res=None,
              res_scale_ref=None):
    """Requant epilogue tuned for Mosaic's lowering (measured on v5e):
    `jnp.round` and direct int32->int8 converts are multi-op and dominate
    the kernel; rounding as +-0.5-then-truncate through an fp32->int8
    convert is ~2x faster. (Half-to-even vs half-away differs only at
    exact .5 boundaries — a <1% one-quantum effect the tests budget for.)"""
    t = acc_i32.astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
    if res is not None:
        t = t + res.astype(jnp.float32) * res_scale_ref[0, 0]
    if relu:
        t = jnp.minimum(jnp.maximum(t, 0.0), 127.0) + 0.5
    else:
        t = jnp.clip(t, -127.0, 127.0)
        t = t + jnp.where(t >= 0, 0.5, -0.5)
    return t.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "has_res", "interpret"),
)
def _matmul_requant(x, w, scale, bias, res, res_scale, relu: bool,
                    has_res: bool, interpret: bool):
    m, k = x.shape
    n = w.shape[1]
    # x block (x2 buffered) + int32 acc + fp32 stage + int8 out (x2)
    tile = _pick_tile(m, 8 if m % 8 == 0 else m, 2 * k + 10 * n)

    def kernel(*refs):
        if has_res:
            x_ref, w_ref, s_ref, b_ref, r_ref, rs_ref, o_ref = refs
            res_blk, rs = r_ref[:], rs_ref
        else:
            x_ref, w_ref, s_ref, b_ref, o_ref = refs
            res_blk, rs = None, None
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = _epilogue(acc, s_ref, b_ref, relu, res_blk, rs)

    in_specs = [
        pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w, scale[None, :], bias[None, :]]
    if has_res:
        in_specs += [
            pl.BlockSpec((tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args += [res, jnp.reshape(res_scale, (1, 1))]
    return pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + m * n * (2 if has_res else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def matmul_requant(
    x, w, scale, bias,
    res=None, res_scale=None, relu: bool = True, interpret: bool = False,
):
    """int8 [M,K] x [K,N] -> int8 [M,N] with the fused serving epilogue.

    ``scale``/``bias`` are the output-scale-folded per-channel fp32 vectors;
    ``res`` an optional int8 [M,N] residual with scalar fp32 ``res_scale``
    (also output-scale-folded)."""
    has_res = res is not None
    if not has_res:
        res = x[:1, :1]  # placeholder, not passed through
        res_scale = jnp.float32(0.0)
    return _matmul_requant(
        x, w, scale, bias, res, jnp.asarray(res_scale, jnp.float32),
        relu, has_res, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("hw", "relu", "has_res", "interpret"),
)
def _conv3x3_requant(x, w9, scale, bias, res, res_scale,
                     hw: Tuple[int, int], relu: bool, has_res: bool,
                     interpret: bool):
    m, k = x.shape
    n = w9.shape[2]
    h, wd = hw
    img = h * wd
    assert m % img == 0
    # 9 live rolled/masked tap copies dominate the K side
    tile = _pick_tile(m, img, 12 * k + 14 * n)

    def kernel(*refs):
        if has_res:
            x_ref, w_ref, s_ref, b_ref, r_ref, rs_ref, o_ref = refs
            res_blk, rs = r_ref[:], rs_ref
        else:
            x_ref, w_ref, s_ref, b_ref, o_ref = refs
            res_blk, rs = None, None
        xb = x_ref[:]
        # Per-row validity per tap: row r = (b, h_r, w_r); the roll wraps
        # across tiles only at rows the mask zeroes (image boundaries).
        rr = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        h_r = (rr // wd) % h
        w_r = rr % wd
        acc = jnp.zeros((tile, n), jnp.int32)
        for ti, (dh, dw) in enumerate(
            (dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)
        ):
            o = dh * wd + dw
            xs = jnp.roll(xb, -o, axis=0) if o else xb
            if dh or dw:
                valid = (
                    (h_r + dh >= 0) & (h_r + dh < h)
                    & (w_r + dw >= 0) & (w_r + dw < wd)
                )
                xs = jnp.where(valid, xs, 0)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[ti], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[:] = _epilogue(acc, s_ref, b_ref, relu, res_blk, rs)

    in_specs = [
        pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, k, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w9, scale[None, :], bias[None, :]]
    if has_res:
        in_specs += [
            pl.BlockSpec((tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args += [res, jnp.reshape(res_scale, (1, 1))]
    return pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * m * k * n,
            bytes_accessed=m * k + 9 * k * n + m * n * (2 if has_res else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def conv3x3_requant(
    x_nhwc, w_hwio, scale, bias,
    res_nhwc=None, res_scale=None, relu: bool = True,
    interpret: bool = False,
):
    """Fused stride-1 pad-1 3x3 int8 conv: [B,H,W,K] -> [B,H,W,N] int8.

    Weights in HWIO [3,3,K,N]; epilogue as :func:`matmul_requant`."""
    b, h, wd, k = x_nhwc.shape
    n = w_hwio.shape[3]
    has_res = res_nhwc is not None
    x2 = x_nhwc.reshape(b * h * wd, k)
    w9 = w_hwio.reshape(9, k, n)
    if has_res:
        res = res_nhwc.reshape(b * h * wd, n)
    else:
        res = x2[:1, :1]
        res_scale = jnp.float32(0.0)
    y = _conv3x3_requant(
        x2, w9, scale, bias, res, jnp.asarray(res_scale, jnp.float32),
        (h, wd), relu, has_res, interpret,
    )
    return y.reshape(b, h, wd, n)
