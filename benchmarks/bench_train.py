#!/usr/bin/env python
"""Training-step micro-benchmark: canonical CTL configuration.

ResNet-50 @ 256x128, P=16 x K=4 (64 images/step), bf16 compute — the
Market1501 recipe (train_scripts/market1501/train_ctl_model_s_r50_*.sh).
Reports steady-state step time and images/sec with synthetic data (isolates
device compute from host IO).
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

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import create_train_state, make_train_step
from centroids_reid_tpu.models import create_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pids", type=int, default=16)
    p.add_argument("--instances", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--mode", choices=["ctl", "base"], default="ctl")
    p.add_argument("--fp32", action="store_true",
                   help="canonical Market recipe precision "
                        "(USE_MIXED_PRECISION False)")
    args = p.parse_args()

    cfg = get_default_cfg()
    cfg.USE_MIXED_PRECISION = not args.fp32
    cfg.SOLVER.IMS_PER_BATCH = args.pids
    cfg.DATALOADER.NUM_INSTANCE = args.instances
    num_classes = 751
    pk = args.pids * args.instances

    model = create_model(cfg, num_classes=num_classes)
    state, tx = create_train_state(cfg, model, num_classes, seed=0)
    step = jax.jit(
        make_train_step(model, tx, cfg, num_classes, args.mode),
        donate_argnums=0,
    )

    rng = np.random.RandomState(0)
    labels = np.repeat(rng.choice(num_classes, args.pids, replace=False),
                       args.instances)
    batch = {
        "images": jnp.asarray(
            rng.randn(1, pk, 256, 128, 3),
            jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32
        ),
        "labels": jnp.asarray(labels)[None],
        "is_real": jnp.ones((1, pk), bool),
    }

    state, metrics = step(state, batch)  # compile
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # force completion
    dt = (time.time() - t0) / args.steps

    print(json.dumps({
        "mode": args.mode,
        "step_ms": round(dt * 1e3, 2),
        "images_per_sec": round(pk / dt, 1),
        "batch_images": pk,
    }))


if __name__ == "__main__":
    main()
