#!/usr/bin/env python
"""RetrievalService latency at the reference's canonical depth (k=100).

Round 2's service routed k>32 through the chunked XLA fallback (~24 ms of
ranking at 100k x 2048); the service now shares ops.retrieval.topk_select
with the CLI kernel. The ranking cost inside the one-dispatch serving
program is isolated by differencing two gallery sizes (embed + dispatch
cost is identical in both), so the row is directly comparable to the raw
kernel rows in bench_retrieval.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.inference.service import RetrievalService
from centroids_reid_tpu.models import create_model, init_model


def _service(cfg, bundle, g, k, use_bf16):
    rng = np.random.RandomState(0)
    emb = rng.randn(g, 2048).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(g)])
    return RetrievalService(
        cfg, emb, paths, k=k, normalize=True, use_bf16_kernel=use_bf16,
        model_bundle=bundle,
    )


def _device_time(svc, imgs, n1=10, n2=60, reps=3):
    """Per-invocation device time of the service's one-dispatch program
    (svc._run: normalize -> embed -> L2 -> topk_select -> exact re-score),
    by the difference method — the dev tunnel's ~45 ms RTT and its +-10 ms
    jitter would otherwise swamp the ms-scale ranking cost. Two image
    buffers are cycled so XLA cannot hoist the body; 50 iterations of
    separation bound the jitter's contribution at ~0.2 ms and the median
    of ``reps`` differences rejects stragglers."""
    import jax.numpy as jnp

    imgs2 = jnp.stack([jnp.asarray(imgs), jnp.asarray(imgs[::-1].copy())])
    args = (svc.params, svc.batch_stats, svc._gf, svc._gf32, svc._gn)

    def run(n):
        @jax.jit
        def prog(params, stats, gf, gf32, gn, imgs2_):
            def body(c, i):
                d, idx = svc._run.__wrapped__(
                    params, stats, gf, gf32, gn, imgs2_[i % 2]
                )
                return c + d.sum() + idx.sum().astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c

        float(prog(*args, imgs2))
        t0 = time.time()
        float(prog(*args, imgs2))
        return time.time() - t0

    diffs = []
    for _ in range(reps):
        ta, tb = run(n1), run(n2)
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    return diffs[len(diffs) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=100_000)
    p.add_argument("--queries", type=int, default=128)
    p.add_argument("--k", type=int, default=100)
    args = p.parse_args()

    cfg = get_default_cfg()
    # tiny input keeps the embed stage cheap (and it cancels in the
    # difference anyway); resnet50 gives 2048-dim embeddings so the gallery
    # matches bench_retrieval.py's [100k, 2048] raw-kernel rows exactly
    cfg.INPUT.SIZE_TEST = [64, 32]
    model = create_model(cfg, num_classes=0)
    params, stats = init_model(model, jax.random.PRNGKey(0), (64, 32))
    bundle = (model, params, stats)

    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (args.queries, 64, 32, 3), np.uint8)

    out = {"gallery": args.gallery, "queries": args.queries, "k": args.k}
    for use_bf16, tag in ((True, "bf16"), (False, "fp32_exact")):
        big = _device_time(
            _service(cfg, bundle, args.gallery, args.k, use_bf16), imgs
        )
        small = _device_time(
            _service(cfg, bundle, 2048, args.k, use_bf16), imgs
        )
        out[f"service_{tag}_k{args.k}_device_ms"] = round(big * 1e3, 3)
        # ranking cost of the extra (gallery - 2048) rows; the embed stage
        # cancels in the difference -> directly comparable to the raw
        # kernel rows in bench_retrieval.py
        out[f"service_{tag}_k{args.k}_rank_ms"] = round((big - small) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
