#!/usr/bin/env python
"""int8 IBN-a at 320x320: where does the 1.07x ceiling come from?

VERDICT r2 weak #8 asks for a measurement-backed conclusion: either the
fp32 InstanceNorm halves (resnet_ibn_a.py:116-118 in the reference) are
the cost — then quantizing around them should close the gap — or layers
1-3 are bandwidth-bound at this resolution and 1.07x is the ceiling.

Variants (all resnet50_ibn_a, 320x320, scanned single-dispatch timing):
  A  bf16 embed                      — the serving baseline
  B  int8 current                    — IN halves fp32 between conv+requant
  C  int8, IN replaced by identity   — numerically WRONG; isolates the
                                       entire IN cost (stats + apply +
                                       concat + the fp32 materialisation)
  D  int8, IN stats+apply in bf16    — the candidate fix: halves the HBM
                                       traffic of the IN pass
Timing: warm scalar-sync (tunnel-safe), median of 3.
"""

import statistics
import time
from contextlib import contextmanager

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

BATCH, SCANS = 128, 4
SIZE = (320, 320)


def _time(fn, *args) -> float:
    float(fn(*args).sum())  # compile + warmup with a real sync
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(*args).sum())
        ts.append(time.time() - t0)
    return statistics.median(ts)


@contextmanager
def _patched_in(variant: str):
    """Swap models.quantized._apply_instance_norm for a variant."""
    from centroids_reid_tpu.models import quantized as q

    orig = q._apply_instance_norm

    def identity(y, in_scale, in_bias):
        return y

    def bf16_in(y, in_scale, in_bias):
        half = in_scale.shape[0]
        x = y[..., :half].astype(jnp.bfloat16)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=(1, 2), keepdims=True) - mu * mu, 0.0
        )
        xh = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return jnp.concatenate(
            [xh * in_scale + in_bias, y[..., half:]], axis=-1
        )

    q._apply_instance_norm = {
        "current": orig, "identity": identity, "bf16": bf16_in
    }[variant]
    try:
        yield
    finally:
        q._apply_instance_norm = orig


def main():
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.models import create_model, init_model
    from centroids_reid_tpu.models.quantized import quantize_reid_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet50_ibn_a"
    cfg.INPUT.SIZE_TEST = list(SIZE)
    model = create_model(cfg, num_classes=0)
    params, bstats = init_model(model, jax.random.PRNGKey(0), SIZE)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (SCANS, BATCH, *SIZE, 3), "uint8")
    xs_u8 = jnp.asarray(imgs)

    # A: bf16 scanned embed
    from centroids_reid_tpu.data.transforms import normalize_batch

    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @jax.jit
    def bf16_many(p, bs, xs):
        def body(_, x_u8):
            x = normalize_batch(x_u8, mean, std, dtype=jnp.bfloat16)
            e = model.apply(
                {"params": p, "batch_stats": bs}, x, method=model.embed
            )
            return None, e.sum()

        _, s = jax.lax.scan(body, None, xs)
        return s

    rows = {}
    t = _time(lambda xs: bf16_many(params, bstats, xs), xs_u8)
    rows["A bf16"] = BATCH * SCANS / t

    for label, variant in (
        ("B int8 current", "current"),
        ("C int8 IN=identity", "identity"),
        ("D int8 IN bf16", "bf16"),
    ):
        with _patched_in(variant):
            qfn = quantize_reid_model(
                model, params, bstats, [imgs[0][:32]],
                cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
            )
            t = _time(lambda xs: qfn.embed_many(xs), xs_u8)
            rows[label] = BATCH * SCANS / t

    print(f"\nresnet50_ibn_a {SIZE[0]}x{SIZE[1]}, B={BATCH} x {SCANS} scans")
    base = rows["A bf16"]
    for k, v in rows.items():
        print(f"  {k:22s} {v:8.1f} imgs/s  ({v / base:.2f}x bf16)")


if __name__ == "__main__":
    main()
