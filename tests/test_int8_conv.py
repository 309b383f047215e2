"""Fused int8 conv+requant kernels vs the unfused XLA reference semantics.

The kernels must reproduce quantize(relu(dequant(conv) + residual)) — the
epilogue algebra folds the output scale into the per-channel scale/bias, so
agreement is up to fp32 associativity: we allow a <=1-quantum difference on
a tiny fraction of boundary elements and exact agreement elsewhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centroids_reid_tpu.ops.int8_conv import conv3x3_requant, matmul_requant

INTERPRET = jax.default_backend() != "tpu"


def _ref_requant(acc_i32, s_in, w_scale, bias, s_out, relu, res=None,
                 res_s=None):
    y = acc_i32.astype(np.float32) * (s_in * w_scale) + bias
    if res is not None:
        y = y + res.astype(np.float32) * res_s
    if relu:
        y = np.maximum(y, 0.0)
    return np.clip(np.round(y / s_out), -127, 127).astype(np.int8)


def _assert_quant_close(got, ref):
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # near-exact: only scale-fold boundary cases may differ by one quantum
    assert (diff != 0).mean() < 1e-2


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("with_res", [True, False])
def test_matmul_requant(relu, with_res):
    rng = np.random.RandomState(0)
    m, k, n = 256, 64, 128
    x = rng.randint(-127, 128, (m, k)).astype(np.int8)
    w = rng.randint(-127, 128, (k, n)).astype(np.int8)
    s_in = np.float32(0.037)
    w_scale = rng.uniform(0.001, 0.01, n).astype(np.float32)
    bias = rng.uniform(-2, 2, n).astype(np.float32)
    s_out = np.float32(0.21)
    res = rng.randint(-127, 128, (m, n)).astype(np.int8) if with_res else None
    res_s = np.float32(0.15) if with_res else None

    acc = x.astype(np.int32) @ w.astype(np.int32)
    ref = _ref_requant(acc, s_in, w_scale, bias, s_out, relu, res, res_s)

    got = matmul_requant(
        jnp.asarray(x), jnp.asarray(w),
        jnp.asarray(s_in * w_scale / s_out), jnp.asarray(bias / s_out),
        res=None if res is None else jnp.asarray(res),
        res_scale=None if res is None else res_s / s_out,
        relu=relu, interpret=INTERPRET,
    )
    _assert_quant_close(np.asarray(got), ref)


@pytest.mark.parametrize("with_res", [True, False])
@pytest.mark.parametrize("bhw", [(2, 8, 4), (1, 16, 8)])
def test_conv3x3_requant(with_res, bhw):
    rng = np.random.RandomState(1)
    b, h, wd = bhw
    k, n = 32, 64
    x = rng.randint(-127, 128, (b, h, wd, k)).astype(np.int8)
    w = rng.randint(-127, 128, (3, 3, k, n)).astype(np.int8)
    s_in = np.float32(0.05)
    w_scale = rng.uniform(0.001, 0.01, n).astype(np.float32)
    bias = rng.uniform(-2, 2, n).astype(np.float32)
    s_out = np.float32(0.33)
    res = (
        rng.randint(-127, 128, (b, h, wd, n)).astype(np.int8)
        if with_res else None
    )
    res_s = np.float32(0.11) if with_res else None

    # int32-exact reference conv (stride 1, pad 1)
    acc = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x, jnp.int32), jnp.asarray(w, jnp.int32),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    ref = _ref_requant(acc, s_in, w_scale, bias, s_out, True, res, res_s)

    got = conv3x3_requant(
        jnp.asarray(x), jnp.asarray(w),
        jnp.asarray(s_in * w_scale / s_out), jnp.asarray(bias / s_out),
        res_nhwc=None if res is None else jnp.asarray(res),
        res_scale=None if res is None else res_s / s_out,
        interpret=INTERPRET,
    )
    _assert_quant_close(np.asarray(got), ref)


def test_conv3x3_multi_image_tiles_do_not_leak():
    """Rolls wrap across tile boundaries only at masked (padding) rows —
    two images with very different content must not contaminate each
    other."""
    rng = np.random.RandomState(2)
    k, n = 32, 32
    h, wd = 8, 4
    w = rng.randint(-8, 8, (3, 3, k, n)).astype(np.int8)
    scale = np.full(n, 1e-4, np.float32)
    bias = np.zeros(n, np.float32)
    a = rng.randint(-127, 128, (1, h, wd, k)).astype(np.int8)
    bimg = rng.randint(-127, 128, (1, h, wd, k)).astype(np.int8)

    def run(x):
        return np.asarray(conv3x3_requant(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
            jnp.asarray(bias), interpret=INTERPRET,
        ))

    separate = np.concatenate([run(a), run(bimg)], axis=0)
    together = run(np.concatenate([a, bimg], axis=0))
    np.testing.assert_array_equal(separate, together)
