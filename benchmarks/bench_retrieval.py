#!/usr/bin/env python
"""Retrieval kernel micro-benchmark: fused distance+top-k at scale.

Measures the north-star scenario (BASELINE.md): 100k-gallery centroid
query, Q=128, D=2048, top-10 — Pallas bf16, Pallas-approx, and exact fp32
XLA paths. Gallery stays resident on device (the realistic serving setup).
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
import jax.numpy as jnp

from centroids_reid_tpu.ops.retrieval import (
    _G_TILE,
    _hier_topk,
    _scores_pallas,
    _scores_xla,
    _topk_pallas,
    _topk_xla,
)


def bench(fn, qf, gf, k, reps=20):
    d = gf.shape[1]
    # f32 accumulation WITHOUT materialising an f32 copy of the gallery
    # (a 1M x 2048 f32 copy is 8 GB of HBM)
    gn = jax.jit(
        lambda g: jnp.einsum(
            "gd,gd->g", g, g, preferred_element_type=jnp.float32
        )[None, :]
    )(gf)
    pad = (-gf.shape[0]) % _G_TILE
    if pad:
        gf = jnp.concatenate([gf, jnp.zeros((pad, d), gf.dtype)])
        gn = jnp.concatenate([gn, jnp.full((1, pad), jnp.inf)], axis=1)
    v, i = fn(qf, gf, gn, k)
    # NOTE: block_until_ready returns early through the axon tunnel; a
    # scalar transfer is the only reliable completion barrier. Without it
    # the (multi-minute) Mosaic compile leaks into the timed loop.
    float(v.sum())
    t0 = time.time()
    for _ in range(reps):
        v, i = fn(qf, gf, gn, k)
    float(v.sum())  # force completion through the tunnel
    return (time.time() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=100_000)
    p.add_argument("--queries", type=int, default=128)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--k", type=int, default=10)
    p.add_argument(
        "--bf16-only", action="store_true",
        help="skip the fp32 paths (required above ~500k: the fp32 gallery "
        "copy plus the bf16 one exceed HBM at 1M x 2048)",
    )
    args = p.parse_args()

    # generate on device: a 1M x 2048 host float64 array would be 16 GB
    gen_dtype = jnp.bfloat16 if args.bf16_only else jnp.float32
    gf = jax.random.normal(
        jax.random.PRNGKey(0), (args.gallery, args.dim), gen_dtype
    )
    qf = jax.random.normal(
        jax.random.PRNGKey(1), (args.queries, args.dim), gen_dtype
    )

    import functools

    def hier_pallas(qf_, gf_, gn_, k_):
        return _hier_topk(_scores_pallas(qf_, gf_, gn_), k_)

    def hier_xla(qf_, gf_, gn_, k_):
        return _hier_topk(_scores_xla(qf_, gf_, gn_), k_)

    results = {"gallery": args.gallery, "queries": args.queries,
               "dim": args.dim}
    qf16, gf16 = qf.astype(jnp.bfloat16), gf.astype(jnp.bfloat16)
    for k in sorted({10, 100, args.k}):
        # the default path (scores kernel + hierarchical selection), any k
        results[f"hier_pallas_bf16_k{k}_ms"] = bench(
            hier_pallas, qf16, gf16, k) * 1e3
        if args.bf16_only:
            continue
        results[f"hier_xla_fp32_exact_k{k}_ms"] = bench(
            hier_xla, qf, gf, k) * 1e3
        # round-1 baselines: streaming merge kernel (k<=32) and chunked XLA
        if k <= 32:
            pallas_packed = functools.partial(_topk_pallas, packed=True)
            results[f"merge_pallas_bf16_k{k}_ms"] = bench(
                pallas_packed, qf16, gf16, k) * 1e3
        results[f"chunked_xla_fp32_k{k}_ms"] = bench(
            _topk_xla, qf, gf, k) * 1e3
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
