"""Flax ResNet / ResNet-IBN-a backbones in NHWC layout.

Behavioural parity notes (vs. the reference torch backbones):

* The plain ResNet **intentionally omits the stem ReLU** — the reference has
  it commented out (/root/reference/modelling/backbones/resnet.py:97,125).
  This changes features, so we reproduce it; IBN-a keeps its stem ReLU
  (/root/reference/modelling/backbones/resnet_ibn_a.py:129).
* ``last_stride`` controls the stride of layer4 (resnet.py:102-103); the
  canonical re-id configs use 1 (doubled spatial resolution in layer4).
* IBN-a applies InstanceNorm to the first half of the channels and BatchNorm
  to the second half of ``bn1`` inside bottlenecks of layers 1-3
  (resnet_ibn_a.py:18-32,116-118).

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), a single
``dtype`` knob for bf16 compute with fp32 params, and no in-place anything —
modules are pure functions of (params, batch_stats, x).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# Matches the reference random_init (resnet.py:156-163): normal(0, sqrt(2/n))
# with n = fan_out of the conv.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class IBN(nn.Module):
    """Instance-Batch Normalization: IN on channels [:C//2], BN on [C//2:].

    Mirrors resnet_ibn_a.py:18-32. Torch ``InstanceNorm2d(affine=True)`` has
    no running stats, so the IN half normalises per-sample in both train and
    eval; only the BN half keeps running statistics.
    """

    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        half = self.planes // 2
        x_in, x_bn = x[..., :half], x[..., half:]
        # InstanceNorm == GroupNorm with one channel per group, computed over
        # H,W per sample. Always uses batch statistics (no running stats).
        x_in = nn.GroupNorm(
            num_groups=half, epsilon=1e-5, dtype=self.dtype, name="IN"
        )(x_in)
        x_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="BN",
        )(x_bn)
        return jnp.concatenate([x_in, x_bn], axis=-1)


def _norm(train: bool, dtype, name: str):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def _conv(features: int, kernel: int, stride: int, dtype, name: str):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_init,
        name=name,
    )


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, optionally computed space-to-depth.

    The parameter is always stored in the reference convention — shape
    ``(7, 7, C, 64)`` under ``conv1/kernel`` — so checkpoints, the torch
    converter, and parity tests are identical for both code paths.

    With ``s2d`` (the TPU-friendly path, MLPerf-style): the input is
    space-to-depth(2) rearranged to ``[N, H/2, W/2, 4C]`` and convolved with
    a 4x4/stride-1 kernel derived from the 7x7 weights. Derivation: the
    reference stem (resnet.py:93, padding 3) computes
    ``y[o] = sum_kh x[2o + kh - 3] W[kh]``; substituting ``i = 2j + d``
    (``d`` the within-pair offset) gives ``kh = 2u + d - 1`` with
    ``u = j - o + 2`` in [0, 4), i.e. a 4-tap conv over s2d rows with the
    7x7 kernel zero-padded to 8x8 at the top-left and regrouped as
    ``(u, v, (dh, dw, c))``. Padding (2, 1) reproduces the original zero
    padding of 3. Exactly the same arithmetic terms (the extra taps are
    structural zeros), so numerics match up to reduction order — but the
    MXU sees 4C=12 input channels at half the spatial size instead of a
    3-channel 7x7 conv it handles poorly.
    """

    features: int = 64
    s2d: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # Same param name/shape/init as nn.Conv(name="conv1") would create.
        kernel7 = self.param(
            "kernel", conv_init, (7, 7, c, self.features), jnp.float32
        )
        if not self.s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel7.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # 7x7 -> 8x8 zero pad at the top-left: tap index kh = 2u + dh - 1.
        k8 = jnp.pad(kernel7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, c, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """Two 3x3 convs (resnet.py:19-48). Used by resnet18/34."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_ibn: bool = False  # not used by the reference for BasicBlock
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 3, self.stride, self.dtype, "conv1")(x)
        out = _norm(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dtype, "conv2")(out)
        out = _norm(train, self.dtype, "bn2")(out)
        if self.has_downsample:
            residual = _conv(
                self.planes * self.expansion, 1, self.stride, self.dtype,
                "downsample_conv",
            )(x)
            residual = _norm(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck (resnet.py:51-87).

    When ``use_ibn`` is set, ``bn1`` becomes the IBN split module
    (resnet_ibn_a.py:41-44).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_ibn: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 1, 1, self.dtype, "conv1")(x)
        if self.use_ibn:
            out = IBN(self.planes, dtype=self.dtype, name="bn1")(out, train)
        else:
            out = _norm(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dtype, "conv2")(out)
        out = _norm(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, self.dtype, "conv3")(out)
        out = _norm(train, self.dtype, "bn3")(out)
        if self.has_downsample:
            residual = _conv(
                self.planes * 4, 1, self.stride, self.dtype, "downsample_conv"
            )(x)
            residual = _norm(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """ResNet trunk without fc/avgpool, NHWC.

    Args mirror the reference constructor (resnet.py:91 and
    resnet_ibn_a.py:79): ``layers`` per-stage block counts, ``last_stride``
    for layer4, ``block`` BasicBlock|Bottleneck, ``ibn`` enables IBN-a
    (layers 1-3 only) plus the stem ReLU, ``stem_relu`` is False for the
    plain variant to reproduce the reference quirk.
    """

    block: ModuleDef = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    ibn: bool = False
    stem_relu: bool = False
    s2d_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = StemConv(64, s2d=self.s2d_stem, dtype=self.dtype, name="conv1")(x)
        x = _norm(train, self.dtype, "bn1")(x)
        if self.stem_relu:  # IBN-a keeps it; plain reference ResNet omits it
            x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        strides = (1, 2, 2, self.last_stride)
        inplanes = 64
        for stage, (planes_mult, nblocks) in enumerate(
            zip((1, 2, 4, 8), self.layers)
        ):
            planes = 64 * planes_mult
            # IBN-a uses plain BN in layer4 (resnet_ibn_a.py:116-118).
            use_ibn = self.ibn and planes != 512
            for b in range(nblocks):
                stride = strides[stage] if b == 0 else 1
                has_ds = b == 0 and (
                    stride != 1 or inplanes != planes * self.block.expansion
                )
                x = self.block(
                    planes,
                    stride=stride,
                    has_downsample=has_ds,
                    use_ibn=use_ibn,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                inplanes = planes * self.block.expansion
        return x


# ---------------------------------------------------------------------------
# Backbone factory — dispatch mirrors /root/reference/modelling/baseline.py:56-81
# ---------------------------------------------------------------------------

_ARCHS = {
    "resnet18": dict(block=BasicBlock, layers=(2, 2, 2, 2), ibn=False, emb=512),
    "resnet34": dict(block=BasicBlock, layers=(3, 4, 6, 3), ibn=False, emb=512),
    "resnet50": dict(block=Bottleneck, layers=(3, 4, 6, 3), ibn=False, emb=2048),
    "resnet101": dict(block=Bottleneck, layers=(3, 4, 23, 3), ibn=False, emb=2048),
    "resnet152": dict(block=Bottleneck, layers=(3, 8, 36, 3), ibn=False, emb=2048),
    "resnet50_ibn_a": dict(block=Bottleneck, layers=(3, 4, 6, 3), ibn=True, emb=2048),
    "resnet101_ibn_a": dict(block=Bottleneck, layers=(3, 4, 23, 3), ibn=True, emb=2048),
    "resnet152_ibn_a": dict(block=Bottleneck, layers=(3, 8, 36, 3), ibn=True, emb=2048),
}


def backbone_emb_size(name: str) -> int:
    return _ARCHS[name]["emb"]


def build_backbone(
    name: str, last_stride: int = 1, dtype=jnp.float32, s2d_stem: bool = False
) -> ResNet:
    if name not in _ARCHS:
        raise ValueError(f"Unknown backbone {name}; options: {sorted(_ARCHS)}")
    spec = _ARCHS[name]
    return ResNet(
        block=spec["block"],
        layers=spec["layers"],
        last_stride=last_stride,
        ibn=spec["ibn"],
        # IBN-a keeps the stem ReLU; the plain local ResNet copy omits it.
        stem_relu=spec["ibn"],
        s2d_stem=s2d_stem,
        dtype=dtype,
        name=None,
    )
