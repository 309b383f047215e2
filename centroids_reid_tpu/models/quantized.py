"""int8 post-training-quantized serving path for the re-id embed pipeline.

A TPU-only addition (no reference counterpart — the reference serves fp32,
/root/reference/inference/inference_utils.py:104-113). The eval embed path
is at the bf16 hardware roofline (see README "Roofline audit"): early
layers HBM-bandwidth-bound, late layers MXU-bound. int8 halves activation
bytes and (for the 1x1 convs that carry most bottleneck FLOPs) doubles MXU
throughput, which is the only remaining headroom without changing the
architecture.

Design (standard TensorRT-style PTQ, specialised for this model family):

* **BN folding**: every ``conv -> BN`` pair is folded into one affine conv
  (exact math): ``W_f = W * g[o]``, ``b_f = beta - mu * g`` with
  ``g = gamma / sqrt(var + eps)``.
* **Input folding**: images stay uint8 all the way to the stem. The eval
  normalisation ``(u/255 - mean)/std`` is an affine map, so it folds into
  the stem weights per *input* channel; the image is padded with the
  rounded mean pixel (== 0 in normalised space to < half a pixel step) and
  shifted by -128, making the int8 input field EXACT — the stem consumes
  raw pixels, and the uint8->float normalise pass disappears entirely.
* **Per-out-channel symmetric int8 weights**, per-tensor symmetric int8
  activations with scales calibrated by absolute max over calibration
  batches (run through the *folded* fp32 graph, so calibrated ranges match
  the quantized graph's dataflow exactly).
* **Requantization points** after every ReLU (and the stem output); the
  block-level residual add runs in fp32 and is requantized after its ReLU.
  MaxPool commutes with quantization (monotone), so it runs on int8 with
  -128 padding (flax max_pool pads -inf).
* The tail (GAP, BNNeck, the retrieval representation) stays fp32 — eval
  metric math is fp32 everywhere in this framework.

IBN-a backbones are supported: the BatchNorm half of each IBN folds into
its conv like any conv+BN; the InstanceNorm half is per-sample (no running
stats, layers 1-3 bn1 only, resnet_ibn_a.py:116-118) and runs *in the int8
domain*: the conv output is requantized at its epilogue and the IN stats +
affine apply read the int8 tensor (measurement showed the old fp32
materialisation between conv and requant was the entire IBN int8 slowdown
— benchmarks/bench_int8_ibn.py).

Accuracy is asserted by tests/test_quantized.py: folded-fp32 == model.embed,
int8-vs-fp32 embedding cosine, and mAP preservation on a separable set.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import _ARCHS

_EPS = 1e-5  # BN epsilon used by every norm in resnet.py


# ---------------------------------------------------------------------------
# Folding
# ---------------------------------------------------------------------------


def _fold_conv_bn(conv_p, bn_p, bn_s) -> Dict[str, jnp.ndarray]:
    """conv -> BN folded to (W_f [kh,kw,ci,co] fp32, b_f [co] fp32)."""
    w = jnp.asarray(conv_p["kernel"], jnp.float32)
    g = jnp.asarray(bn_p["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_s["var"], jnp.float32) + _EPS
    )
    b = jnp.asarray(bn_p["bias"], jnp.float32) - jnp.asarray(
        bn_s["mean"], jnp.float32
    ) * g
    return {"w": w * g[None, None, None, :], "b": b}


def _block_plan(name: str, last_stride: int) -> List[Tuple]:
    """Static per-block plan
    [(block_name, kind, planes, stride, has_downsample, use_ibn)].

    Mirrors ResNet.__call__ (resnet.py:221-253); IBN applies to bn1 of
    layers 1-3 bottlenecks only (resnet_ibn_a.py:116-118). The plan is
    also serialised into QuantizedEmbed.save()'s metadata."""
    spec = _ARCHS[name]
    kind = "bottleneck" if spec["block"].__name__ == "Bottleneck" else "basic"
    expansion = 4 if kind == "bottleneck" else 1
    strides = (1, 2, 2, last_stride)
    plan = []
    inplanes = 64
    for stage, (mult, nblocks) in enumerate(zip((1, 2, 4, 8), spec["layers"])):
        planes = 64 * mult
        use_ibn = spec["ibn"] and planes != 512
        for b in range(nblocks):
            stride = strides[stage] if b == 0 else 1
            has_ds = b == 0 and (
                stride != 1 or inplanes != planes * expansion
            )
            plan.append(
                (f"layer{stage + 1}_{b}", kind, planes, stride, has_ds,
                 use_ibn)
            )
            inplanes = planes * expansion
    return plan


def _fold_conv_ibn(conv_p, ibn_p) -> Dict[str, jnp.ndarray]:
    """conv -> IBN: the BatchNorm half (channels [half:]) folds into the
    conv exactly as conv+BN; the InstanceNorm half is per-sample (no
    running stats, resnet.py:35-62) and stays a runtime op — its affine
    params ride along as ``in_scale``/``in_bias``."""
    w = jnp.asarray(conv_p["kernel"], jnp.float32)
    c = w.shape[3]
    half = c // 2
    bn_p, bn_s = ibn_p["params"]["BN"], ibn_p["stats"]["BN"]
    g_bn = jnp.asarray(bn_p["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_s["var"], jnp.float32) + _EPS
    )
    b_bn = jnp.asarray(bn_p["bias"], jnp.float32) - jnp.asarray(
        bn_s["mean"], jnp.float32
    ) * g_bn
    g = jnp.concatenate([jnp.ones((half,), jnp.float32), g_bn])
    b = jnp.concatenate([jnp.zeros((half,), jnp.float32), b_bn])
    return {
        "w": w * g[None, None, None, :],
        "b": b,
        "in_scale": jnp.asarray(ibn_p["params"]["IN"]["scale"], jnp.float32),
        "in_bias": jnp.asarray(ibn_p["params"]["IN"]["bias"], jnp.float32),
    }


def _instance_norm_int8_domain(z_half, s, in_scale, in_bias):
    """Per-sample IN whose reductions read the INT8 tensor ``z_half``
    (real values = s * int). Exact rescaling identity: with mu_r = s*mu
    and var_r = s^2*var,

        (real - mu_r) * rsqrt(var_r + eps)
      = s*(int - mu) * rsqrt(s^2*var + eps)
      = (int - mu) * rsqrt(var + eps / s^2)

    so the scale cancels out of the stats and only re-enters through the
    eps term. Oracle-tested against the fp32 _apply_instance_norm at
    ~float-rounding tolerance (tests/test_quantized.py) — the identity is
    exact, not approximate."""
    x = z_half.astype(jnp.float32)
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=(1, 2), keepdims=True) - mu * mu, 0.0
    )
    k = jax.lax.rsqrt(var + _EPS / (s * s)) * in_scale
    return (x - mu) * k + in_bias


def _apply_instance_norm(y, in_scale, in_bias):
    """Per-sample IN over H,W on the first half of the channels (fp32),
    matching flax GroupNorm(one-channel groups): fp32 fast-variance stats,
    eps 1e-5."""
    half = in_scale.shape[0]
    x = y[..., :half]
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=(1, 2), keepdims=True) - mu * mu, 0.0
    )
    xh = (x - mu) * jax.lax.rsqrt(var + _EPS)
    return jnp.concatenate([xh * in_scale + in_bias, y[..., half:]], axis=-1)


def fold_backbone(
    model, params, batch_stats, pixel_mean: Sequence[float],
    pixel_std: Sequence[float],
) -> Dict[str, Any]:
    """Fold all conv+BN pairs of a plain-ResNet re-id model, including the
    input-normalisation fold into the stem. Returns the folded fp32 tree
    plus the static plan and input-prep constants."""
    bb_p, bb_s = params["backbone"], batch_stats["backbone"]

    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    # z = pad(u8, round(255*mean)) - 128; x_norm = alpha*z + delta exactly
    alpha = 1.0 / (255.0 * std)
    delta = (128.0 / 255.0 - mean) / std
    pad_value = np.round(255.0 * mean).astype(np.int32)

    stem = _fold_conv_bn(bb_p["conv1"], bb_p["bn1"], bb_s["bn1"])
    w_f = stem["w"]  # [7,7,3,64]
    # per-in-channel alpha fold + delta correction into the bias
    stem_w = w_f * jnp.asarray(alpha)[None, None, :, None]
    stem_b = stem["b"] + jnp.einsum(
        "hwco,c->o", w_f, jnp.asarray(delta)
    )

    blocks = []
    plan = _block_plan(model.backbone_name, model.last_stride)
    for bname, kind, planes, stride, has_ds, use_ibn in plan:
        bp, bs = bb_p[bname], bb_s[bname]
        if use_ibn:
            conv1 = _fold_conv_ibn(
                bp["conv1"],
                {"params": bp["bn1"], "stats": bs["bn1"]},
            )
        else:
            conv1 = _fold_conv_bn(bp["conv1"], bp["bn1"], bs["bn1"])
        entry = {
            "conv1": conv1,
            "conv2": _fold_conv_bn(bp["conv2"], bp["bn2"], bs["bn2"]),
        }
        if kind == "bottleneck":
            entry["conv3"] = _fold_conv_bn(bp["conv3"], bp["bn3"], bs["bn3"])
        if has_ds:
            entry["ds"] = _fold_conv_bn(
                bp["downsample_conv"], bp["downsample_bn"], bs["downsample_bn"]
            )
        blocks.append(entry)

    return {
        "stem": {"w": stem_w, "b": stem_b},
        "blocks": blocks,
        "bnneck": {
            "scale": jnp.asarray(params["bnneck"]["scale"], jnp.float32),
            "bias": jnp.asarray(params["bnneck"]["bias"], jnp.float32),
            "mean": jnp.asarray(batch_stats["bnneck"]["mean"], jnp.float32),
            "var": jnp.asarray(batch_stats["bnneck"]["var"], jnp.float32),
        },
        "plan": plan,
        "pad_value": pad_value,
        "stem_relu": _ARCHS[model.backbone_name]["ibn"],  # plain: no stem ReLU
    }


# ---------------------------------------------------------------------------
# Shared forward structure; two engines (fp32 observe / int8 execute)
# ---------------------------------------------------------------------------


def _prep_input(imgs_u8, pad_value) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> int8 field [B,H+6,W+6,3] (stem pad 3, VALID conv).

    The pad value is the rounded mean pixel == normalised zero; -128 shift
    keeps the exact pixel value in int8."""
    z = jnp.pad(
        imgs_u8.astype(jnp.int32),
        ((0, 0), (3, 3), (3, 3), (0, 0)),
        constant_values=0,
    )
    # overwrite padding with the per-channel mean pixel
    b, h, w, _ = imgs_u8.shape
    mask = jnp.zeros((h + 6, w + 6, 1), bool).at[3:-3, 3:-3].set(True)
    z = jnp.where(mask, z, jnp.asarray(pad_value)[None, None, :])
    return (z - 128).astype(jnp.int8)


def _conv_int8(z_i8, w_i8, stride: int, pad: int, acc_dtype=jnp.int32):
    """int8 conv with a selectable accumulator dtype.

    bf16 accumulation (measured max rel err 3.3e-3 vs exact int32 — under
    half an int8 quantum) halves the bytes of the materialised accumulator
    the separate XLA requant pass must re-read, which is where most of the
    quantized graph's time goes on TPU."""
    return jax.lax.conv_general_dilated(
        z_i8, w_i8, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def _conv_fp(x, w, stride: int, pad: int):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _maxpool_int8(x_i8):
    return jax.lax.reduce_window(
        x_i8, jnp.int8(-128), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _maxpool_fp(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class _FpEngine:
    """fp32 engine over the folded graph; records absmax at requant points.

    Running it IS the calibration pass — ranges are observed at exactly the
    quantization points of the int8 engine's dataflow (including the
    downsample branch, which the int8 engine quantizes)."""

    def __init__(self, fold, percentile: float = 100.0):
        self.fold = fold
        self.percentile = percentile
        self.maxes: Dict[str, jnp.ndarray] = {}

    def input(self, imgs_u8):
        return _prep_input(imgs_u8, self.fold["pad_value"]).astype(jnp.float32)

    def _observe(self, name, x):
        a = jnp.abs(x)
        if self.percentile >= 100.0:
            self.maxes[name] = jnp.max(a)
        else:
            # percentile clipping: robust to activation outliers, which
            # abs-max calibration otherwise lets blow up the scale (and
            # with it the effective resolution of every inlier). The
            # percentile is taken over a strided subsample (<= 2^20
            # elements) — jnp.percentile lowers to a full sort, and
            # sorting every multi-hundred-MB activation just to estimate
            # a scale would dominate calibration.
            flat = a.reshape(-1)
            stride = -(-flat.shape[0] // (1 << 20))
            self.maxes[name] = jnp.percentile(
                flat[::stride], self.percentile
            )
        return x

    def conv_act(self, x, entry, stride, pad, qname, relu=True):
        y = _conv_fp(x, entry["w"], stride, pad) + entry["b"]
        if relu:
            y = jax.nn.relu(y)
        return self._observe(qname, y)

    def conv_add_act(self, x, entry, stride, pad, res, qname):
        y = _conv_fp(x, entry["w"], stride, pad) + entry["b"]
        return self._observe(qname, jax.nn.relu(y + res))

    def conv_in_act(self, x, entry, qname):
        """conv (BN half folded) -> InstanceNorm on the first half -> ReLU.

        Also observes the PRE-IN conv output: the int8 engine requantizes
        there (``qname + ".pre"``) so the IN runs in the int8 domain."""
        y = _conv_fp(x, entry["w"], 1, 0) + entry["b"]
        self._observe(qname + ".pre", y)
        y = _apply_instance_norm(y, entry["in_scale"], entry["in_bias"])
        return self._observe(qname, jax.nn.relu(y))

    def dequant(self, x):
        return x

    def maxpool(self, x):
        return _maxpool_fp(x)


class _Int8Engine:
    """int8 engine: tensors are (int8 values, fp32 per-tensor scale) pairs.

    Stride-1 1x1 and 3x3 convs run as fused Pallas conv+requant kernels
    (ops/int8_conv.py) — conv, scale/bias, residual add, ReLU and the int8
    round/clip in one VMEM-resident program, so accumulators never touch
    HBM. Stride-2 1x1 convs pre-slice rows (1x1 taps are independent) and
    reuse the matmul kernel. The stem (7x7) and stride-2 3x3 convs use the
    XLA fallback: int8 conv, then a separate requant pass."""

    def __init__(self, qtree, use_pallas: bool, interpret: bool,
                 acc_dtype=jnp.int32):
        self.q = qtree
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.acc_dtype = acc_dtype

    def input(self, imgs_u8):
        # exact: int8 pixel values with scale 1 (alpha folded into weights)
        return _prep_input(imgs_u8, self.q["pad_value"]), jnp.float32(1.0)

    # -- XLA fallback pieces ------------------------------------------------
    # NOTE the exact formulation matters: this unfolded form (per-channel
    # scale, then a separate divide inside the quant step with a single
    # jnp.clip) measures ~25% FASTER end-to-end than the "optimised"
    # scale-folded variant with relu-elided clamping — XLA:TPU pattern-
    # matches clip(round(x/s)) into its quantize lowering. Don't "improve"
    # this without re-measuring.
    def _conv_fp_out(self, rep, entry, stride, pad):
        z, s_in = rep
        acc = _conv_int8(z, entry["w"], stride, pad, self.acc_dtype)
        return acc.astype(jnp.float32) * (s_in * entry["w_scale"]) + entry["b"]

    def _quant(self, name, x):
        s = self.q["act_scales"][name]
        q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        return q, s

    # -- fused kernels ------------------------------------------------------
    def _folded(self, rep, entry, qname):
        """Output-scale-folded per-channel scale/bias for the epilogue."""
        _, s_in = rep
        s_out = self.q["act_scales"][qname]
        return (s_in * entry["w_scale"]) / s_out, entry["b"] / s_out, s_out

    def _kernel_eligible(self, entry, stride, hw_elems: int):
        kh, kw = entry["w"].shape[:2]
        if not self.use_pallas:
            return None
        if self.use_pallas == "large" and hw_elems < 2048:
            return None
        if (kh, kw) == (1, 1):
            return "matmul"
        if (kh, kw) == (3, 3) and stride == 1:
            return "conv3x3"
        return None

    def conv_act(self, rep, entry, stride, pad, qname, relu=True):
        z0 = rep[0]
        kind = self._kernel_eligible(entry, stride, z0.shape[1] * z0.shape[2])
        if kind is None:
            y = self._conv_fp_out(rep, entry, stride, pad)
            if relu:
                y = jax.nn.relu(y)
            return self._quant(qname, y)
        from ..ops.int8_conv import conv3x3_requant, matmul_requant

        z, _ = rep
        scale, bias, s_out = self._folded(rep, entry, qname)
        if kind == "matmul":
            if stride > 1:
                z = z[:, ::stride, ::stride, :]
            b, h, w, c = z.shape
            n = entry["w"].shape[3]
            y = matmul_requant(
                z.reshape(b * h * w, c), entry["w"].reshape(c, n),
                scale, bias, relu=relu, interpret=self.interpret,
            ).reshape(b, h, w, n)
        else:
            y = conv3x3_requant(
                z, entry["w"], scale, bias, relu=relu,
                interpret=self.interpret,
            )
        return y, s_out

    def conv_add_act(self, rep, entry, stride, pad, res_rep, qname):
        z0 = rep[0]
        kind = self._kernel_eligible(entry, stride, z0.shape[1] * z0.shape[2])
        res_z, res_s = res_rep
        if kind is None:
            y = self._conv_fp_out(rep, entry, stride, pad)
            y = jax.nn.relu(y + res_z.astype(jnp.float32) * res_s)
            return self._quant(qname, y)
        from ..ops.int8_conv import conv3x3_requant, matmul_requant

        z, _ = rep
        scale, bias, s_out = self._folded(rep, entry, qname)
        res_scale = res_s / s_out
        if kind == "matmul":
            b, h, w, c = z.shape
            n = entry["w"].shape[3]
            y = matmul_requant(
                z.reshape(b * h * w, c), entry["w"].reshape(c, n),
                scale, bias, res=res_z.reshape(b * h * w, n),
                res_scale=res_scale, relu=True, interpret=self.interpret,
            ).reshape(b, h, w, n)
        else:
            y = conv3x3_requant(
                z, entry["w"], scale, bias, res_nhwc=res_z,
                res_scale=res_scale, relu=True, interpret=self.interpret,
            )
        return y, s_out

    def conv_in_act(self, rep, entry, qname):
        """IBN bn1 in the int8 dataflow: requantize the conv output at its
        epilogue (one fused pass, int8 materialisation), then run the
        per-sample InstanceNorm *in the int8 domain* — both reduction
        passes and the affine apply read int8, 4x fewer bytes than the
        old fp32 materialisation. Measurement (benchmarks/bench_int8_ibn
        .py) showed that fp32 materialisation WAS the whole IBN-a int8
        gap (1.06x with it, 1.52x without IN entirely; casting the IN
        math to bf16 changed nothing because the conv still wrote fp32).
        Cost: one extra per-tensor quantization before IN; deployment
        cosine vs fp32 stays > 0.99 (tests/test_quantized.py)."""
        half = entry["in_scale"].shape[0]
        z, s = self._quant(
            qname + ".pre", self._conv_fp_out(rep, entry, 1, 0)
        )
        s_out = self.q["act_scales"][qname]
        yin = _instance_norm_int8_domain(
            z[..., :half], s, entry["in_scale"], entry["in_bias"]
        )
        q_in = jnp.clip(
            jnp.round(jax.nn.relu(yin) / s_out), -127, 127
        ).astype(jnp.int8)
        xbn = z[..., half:].astype(jnp.float32) * s
        q_bn = jnp.clip(
            jnp.round(jax.nn.relu(xbn) / s_out), -127, 127
        ).astype(jnp.int8)
        return jnp.concatenate([q_in, q_bn], axis=-1), s_out

    def dequant(self, rep):
        z, s = rep
        return z.astype(jnp.float32) * s

    def maxpool(self, rep):
        z, s = rep
        return _maxpool_int8(z), s


def _backbone_forward(eng, fold_or_q, imgs_u8):
    """The folded ResNet trunk, engine-agnostic. Returns fp32 [B,h,w,C]."""
    f = fold_or_q
    rep = eng.input(imgs_u8)
    # stem: input pre-padded by 3, VALID conv; no fused kernel (7x7, Cin=3)
    rep = eng.conv_act(
        rep, f["stem"], stride=2, pad=0, qname="stem",
        relu=bool(f["stem_relu"]),
    )
    rep = eng.maxpool(rep)

    for entry, (bname, kind, planes, stride, has_ds, use_ibn) in zip(
        f["blocks"], f["plan"]
    ):
        if kind == "bottleneck":
            if use_ibn:
                r1 = eng.conv_in_act(rep, entry["conv1"], f"{bname}.a1")
            else:
                r1 = eng.conv_act(rep, entry["conv1"], 1, 0, f"{bname}.a1")
            r2 = eng.conv_act(r1, entry["conv2"], stride, 1, f"{bname}.a2")
            last, last_stride, last_pad = entry["conv3"], 1, 0
            pre = r2
        else:  # basic
            r1 = eng.conv_act(rep, entry["conv1"], stride, 1, f"{bname}.a1")
            last, last_stride, last_pad = entry["conv2"], 1, 1
            pre = r1
        if has_ds:
            res = eng.conv_act(
                rep, entry["ds"], stride, 0, f"{bname}.ds", relu=False
            )
        else:
            res = rep
        rep = eng.conv_add_act(
            pre, last, last_stride, last_pad, res, f"{bname}.out"
        )
    return eng.dequant(rep)


def _embed_tail(bnneck, trunk_fp32):
    feat = jnp.mean(trunk_fp32, axis=(1, 2))
    g = bnneck["scale"] * jax.lax.rsqrt(bnneck["var"] + _EPS)
    return (feat - bnneck["mean"]) * g + bnneck["bias"]


# ---------------------------------------------------------------------------
# Calibration + weight quantization
# ---------------------------------------------------------------------------


def _quantize_weights(entry) -> Dict[str, jnp.ndarray]:
    w = entry["w"]
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s[None, None, None, :]), -127, 127)
    out = {"w": q.astype(jnp.int8), "w_scale": s, "b": entry["b"]}
    for key in ("in_scale", "in_bias"):  # IBN affine rides along
        if key in entry:
            out[key] = entry[key]
    return out


def calibrate(fold, calib_batches, percentile: float = 100.0
              ) -> Dict[str, float]:
    """Run the folded fp32 graph over calibration uint8 batches; returns
    per-quant-point activation scales (range / 127). ``percentile`` < 100
    clips activation outliers (per batch) instead of taking the absolute
    max — more robust on trained checkpoints with heavy-tailed
    activations."""

    @jax.jit
    def one(imgs_u8):
        eng = _FpEngine(fold, percentile)
        _backbone_forward(eng, fold, imgs_u8)
        return eng.maxes

    maxes: Dict[str, float] = {}
    n = 0
    for imgs in calib_batches:
        # one device_get for the whole dict — per-scalar float() fetches
        # would cost one ~45 ms tunnel roundtrip per layer per batch
        m = jax.device_get(one(jnp.asarray(imgs)))
        for k, v in m.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibration requires at least one batch")
    return {k: max(v, 1e-12) / 127.0 for k, v in maxes.items()}


class QuantizedEmbed:
    """Callable int8 embed pipeline: uint8 [B,H,W,3] -> fp32 [B, D].

    Build with :func:`quantize_reid_model`. The quantized parameters are a
    pytree (``.qtree``); the call is a single jitted XLA program."""

    def __init__(self, qtree, plan, stem_relu, use_pallas: bool = False,
                 acc_dtype=jnp.bfloat16):
        self._static = {"plan": plan, "stem_relu": stem_relu}
        self._acc_dtype = acc_dtype
        self._use_pallas = use_pallas
        self.qtree = qtree
        # fused kernels run natively on TPU; anywhere else (CPU tests,
        # multi-chip CPU dry-runs) they run in interpret mode
        interpret = jax.default_backend() != "tpu"

        def one(qtree, imgs_u8):
            f = dict(qtree)
            f.update(self._static)
            eng = _Int8Engine(f, use_pallas, interpret, acc_dtype)
            trunk = _backbone_forward(eng, f, imgs_u8)
            return _embed_tail(f["bnneck"], trunk)

        # unjitted form for embedding into larger jitted programs
        # (e.g. RetrievalService's one-dispatch query path)
        self.apply = one
        self._run = jax.jit(one)

        @jax.jit
        def run_many(qtree, imgs_u8_sb):
            return jax.lax.scan(
                lambda _, u8: (None, one(qtree, u8)), None, imgs_u8_sb
            )[1]

        self._run_many = run_many

    def __call__(self, imgs_u8):
        return self._run(self.qtree, imgs_u8)

    def embed_many(self, imgs_u8_sb):
        """[S, B, H, W, 3] uint8 -> [S, B, D] fp32 in ONE dispatch —
        amortises the fixed per-dispatch latency S-fold (same pattern as
        engine/evaluate.make_embed_many_fn)."""
        return self._run_many(self.qtree, imgs_u8_sb)

    @staticmethod
    def npz_path(path: str) -> str:
        """np.savez appends '.npz' to bare paths; normalise once so save,
        load and existence checks always agree."""
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: str, extra_meta: Optional[Dict] = None) -> None:
        """Serialise the quantized model (weights, scales, plan) to one
        ``.npz`` — deploy without re-calibration. ``extra_meta`` (a small
        JSON-able dict, e.g. checkpoint identity + calibration settings) is
        stored verbatim and surfaced as ``.extra_meta`` on load so callers
        can detect stale artifacts."""
        import json
        import os

        path = self.npz_path(path)
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)

        flat: Dict[str, np.ndarray] = {}

        def walk(prefix, obj):
            if isinstance(obj, dict):
                for k, v in obj.items():
                    walk(f"{prefix}/{k}", v)
            elif isinstance(obj, (list, tuple)):
                for i, v in enumerate(obj):
                    walk(f"{prefix}/{i}", v)
            else:
                flat[prefix] = np.asarray(obj)

        walk("q", self.qtree)
        meta = json.dumps({
            "plan": self._static["plan"],
            "stem_relu": bool(self._static["stem_relu"]),
            "n_blocks": len(self.qtree["blocks"]),
            "acc_dtype": jnp.dtype(self._acc_dtype).name,
            "use_pallas": self._use_pallas,
            "extra": extra_meta or {},
        })
        np.savez(path, __meta__=np.asarray(meta), **flat)

    @staticmethod
    def load(path: str) -> "QuantizedEmbed":
        import json

        raw = np.load(QuantizedEmbed.npz_path(path), allow_pickle=False)
        meta = json.loads(str(raw["__meta__"]))

        tree: Dict[str, Any] = {}
        for key in raw.files:
            if key == "__meta__":
                continue
            parts = key.split("/")[1:]  # strip the "q" root
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(raw[key])

        blocks = [
            tree["blocks"][str(i)] for i in range(meta["n_blocks"])
        ]
        qtree = {
            "stem": tree["stem"],
            "blocks": blocks,
            "bnneck": tree["bnneck"],
            "act_scales": tree["act_scales"],
            "pad_value": np.asarray(tree["pad_value"], np.int32),
        }
        plan = [tuple(p) for p in meta["plan"]]
        out = QuantizedEmbed(
            qtree, plan, meta["stem_relu"],
            use_pallas=meta.get("use_pallas", False),
            acc_dtype=jnp.dtype(meta.get("acc_dtype", "bfloat16")),
        )
        out.extra_meta = meta.get("extra", {})
        return out


def quantize_reid_model(
    model, params, batch_stats, calib_batches,
    pixel_mean: Sequence[float], pixel_std: Sequence[float],
    use_pallas: bool = False, acc_dtype=jnp.bfloat16,
    calib_percentile: float = 100.0,
) -> QuantizedEmbed:
    """PTQ of a ReidModel for serving: fold, calibrate, quantize.

    ``calib_batches``: iterable of uint8 [B,H,W,3] arrays (a few batches of
    the target domain; the inference CLIs self-calibrate on their input
    folder). All batches should share the deployment batch shape.
    ``calib_percentile`` < 100 enables outlier-clipped calibration."""
    fold = fold_backbone(model, params, batch_stats, pixel_mean, pixel_std)
    act_scales = calibrate(fold, calib_batches, calib_percentile)

    qtree = {
        "stem": _quantize_weights(fold["stem"]),
        "blocks": [
            {k: _quantize_weights(v) for k, v in entry.items()}
            for entry in fold["blocks"]
        ],
        "bnneck": fold["bnneck"],
        "act_scales": {k: jnp.float32(v) for k, v in act_scales.items()},
        "pad_value": fold["pad_value"],
    }
    return QuantizedEmbed(
        qtree, fold["plan"], fold["stem_relu"], use_pallas=use_pallas,
        acc_dtype=acc_dtype,
    )


def serving_identity(cfg, model) -> Dict:
    """The identity metadata stamped into (and validated against) a cached
    int8 artifact — everything whose change must invalidate the cache."""
    return {
        "model_name": model.backbone_name,
        "last_stride": model.last_stride,
        "input_size": list(cfg.INPUT.SIZE_TEST),
        "pretrain_path": str(cfg.MODEL.PRETRAIN_PATH),
        "calib_pct": float(cfg.TPU.INT8_CALIB_PCT),
        # normalization constants are folded into the stem weights and the
        # pad_value, and calibration depth changes the activation scales —
        # all of them must invalidate a cached artifact
        "pixel_mean": [float(v) for v in cfg.INPUT.PIXEL_MEAN],
        "pixel_std": [float(v) for v in cfg.INPUT.PIXEL_STD],
        "calib_batches": int(cfg.TPU.INT8_CALIB_BATCHES),
        # dataflow format: 2 = int8-domain InstanceNorm (needs the
        # ".pre" activation scales; older artifacts lack them)
        "format": 2,
    }


def quantize_for_serving(cfg, model, params, batch_stats, records,
                         store=None) -> QuantizedEmbed:
    """The cfg-driven serving flow shared by the inference CLIs, the
    ONLY_TEST deployment-accuracy eval and RetrievalService:

    * ``TPU.INT8_CACHE_PATH`` set and present: load the saved artifact —
      after validating its identity metadata (model name, input size,
      checkpoint path, calibration settings) against the current config; a
      mismatch recalibrates (and overwrites) rather than silently serving
      a stale model.
    * otherwise: self-calibrate on the leading ``TPU.INT8_CALIB_BATCHES``
      of ``records`` (a Record list), honouring ``TPU.INT8_CALIB_PCT``,
      and save to the cache path when one is configured.
    """
    import logging
    import os

    from ..data.loader import EvalLoader

    log = logging.getLogger(__name__)
    identity = serving_identity(cfg, model)
    cache = cfg.TPU.INT8_CACHE_PATH
    cache = QuantizedEmbed.npz_path(cache) if cache else ""
    if cache and os.path.exists(cache):
        qfn = QuantizedEmbed.load(cache)
        if qfn.extra_meta == identity:
            log.info(f"int8 serving: loaded quantized model {cache}")
            return qfn
        log.warning(
            f"int8 serving: cached artifact {cache} was built for "
            f"{qfn.extra_meta}, current run is {identity} — recalibrating"
        )

    n = max(1, cfg.TPU.INT8_CALIB_BATCHES) * cfg.TEST.IMS_PER_BATCH
    # keep only full batches so every calibration pass shares one static
    # shape (a valid-filtered partial tail would retrace the jitted
    # calibration program per unique shape); the loader zero-pads the tail,
    # so a partial batch is detectable via its valid mask
    calib = [
        b["images"][b["valid"]]
        for b in EvalLoader(records[:n], cfg, store=store)
        if bool(b["valid"].all())
    ]
    if not calib:  # fewer records than one batch: pad by repetition instead
        b = next(iter(EvalLoader(records[:n], cfg, store=store)))
        imgs = np.asarray(b["images"][b["valid"]])
        reps = -(-cfg.TEST.IMS_PER_BATCH // max(len(imgs), 1))
        calib = [np.tile(imgs, (reps, 1, 1, 1))[: cfg.TEST.IMS_PER_BATCH]]
    qfn = quantize_reid_model(
        model, params, batch_stats, calib,
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
        calib_percentile=cfg.TPU.INT8_CALIB_PCT,
    )
    log.info(f"int8 serving active (calibrated on {len(calib)} batches)")
    if cache:
        qfn.save(cache, extra_meta=identity)
        log.info(f"saved quantized model to {cache}")
    return qfn


def folded_fp_embed(model, params, batch_stats, pixel_mean, pixel_std):
    """The folded fp32 embed fn (no quantization) — the calibration graph.

    Used by tests to prove the folding itself is exact vs ``model.embed``."""
    fold = fold_backbone(model, params, batch_stats, pixel_mean, pixel_std)

    @jax.jit
    def run(imgs_u8):
        eng = _FpEngine(fold)
        trunk = _backbone_forward(eng, fold, imgs_u8)
        return _embed_tail(fold["bnneck"], trunk)

    return run
