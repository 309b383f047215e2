#!/usr/bin/env python
"""Evaluation-at-scale benchmark: full CMC/mAP on a synthetic 1M gallery.

The materialising evaluator (R1mAP default path) needs Q x G fp32 scores +
int argsort indices in HBM — ~27 GB at Q=3,368 x G=1M, over a v5e's HBM by
construction. The streaming evaluator (metrics/streaming_eval.py) computes
the identical metrics by chunked rank-counting with O(Q*H) state, so the
gallery size is bounded by the gallery's own footprint, not the matrix's.

Synthetic structure: queries are noisy copies of gallery members, so the
metrics are non-trivial (mAP near 1) and verify ranking sanity at scale.
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
import numpy as np

from centroids_reid_tpu.metrics import eval_func_streaming


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=1_000_000)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--imgs-per-pid", type=int, default=8)
    args = p.parse_args()

    g, q, d = args.gallery, args.queries, args.dim
    n_pids = g // args.imgs_per_pid
    # gallery generated on device (a host copy of 1M x 2048 fp32 is 8 GB)
    gf = jax.random.normal(jax.random.PRNGKey(0), (g, d), jnp.float32)
    g_pids = np.arange(g) % n_pids
    g_camids = np.arange(g) % 4

    rng = np.random.RandomState(1)
    src = rng.randint(0, g, q)
    q_pids = g_pids[src]
    q_camids = (g_camids[src] + 1) % 4  # different camera -> never removed
    # queries = noisy copies of their source rows (host-sized gather)
    qf = np.asarray(jnp.take(gf, jnp.asarray(src), axis=0))
    qf = qf + 0.1 * rng.randn(q, d).astype(np.float32)

    t0 = time.time()
    m = eval_func_streaming(qf, gf, q_pids, g_pids, q_camids, g_camids)
    dt = time.time() - t0  # eval_func_streaming returns host values (synced)

    print(json.dumps({
        "gallery": g, "queries": q, "dim": d,
        "eval_seconds": round(dt, 2),
        "mAP": round(float(m.mAP), 4),
        "rank1": round(float(m.cmc[0]), 4),
    }))


if __name__ == "__main__":
    main()
