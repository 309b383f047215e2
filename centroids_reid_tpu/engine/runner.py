"""Top-level orchestration: run_main / run_single equivalents.

Mirrors /root/reference/utils/misc.py:73-179: LOG_DIR defaulting, the
REPRODUCIBLE multi-run loop, the ONLY_TEST path that loads a checkpoint and
evaluates twice with USE_CENTROIDS toggled, and the train-then-double-test
path. Checkpoints may be orbax directories (native) or torch .ckpt/.pth
files from the reference (converted on load via models/convert.py).
"""

from __future__ import annotations

import os
from typing import Dict

from ..data import init_dataset
from ..models.convert import graft, load_reference_checkpoint
from .checkpoint import restore_state
from .evaluate import run_validation, validate_rerank_config
from .fit import build_model_and_state, fit
from .logging import MetricsLogger, latest_version_dir, next_version_dir


def load_model_for_test(cfg, dataset):
    """load_from_checkpoint equivalent (misc.py:129-135)."""
    model, state, _ = build_model_and_state(cfg, dataset)
    path = cfg.MODEL.PRETRAIN_PATH
    if not path:
        raise ValueError("TEST.ONLY_TEST requires MODEL.PRETRAIN_PATH")
    if os.path.isdir(path):
        state = restore_state(path, state)
        params_model = state.params["model"]
        batch_stats = state.batch_stats
    else:
        # reference torch checkpoint
        converted = load_reference_checkpoint(path)
        params_model = graft(state.params["model"], converted["params"])
        batch_stats = graft(state.batch_stats, converted["batch_stats"])
    return model, params_model, batch_stats


def allocate_version_dir(base: str, name: str) -> str:
    """Race-free logs/<name>/version_N allocation across hosts.

    Process 0 allocates (mkdir) the next version dir; everyone else picks
    the newest one *after* a global barrier — the rank-zero analogue of
    Lightning's logger version handling. Single-process: plain allocation.
    """
    import jax

    if jax.process_count() == 1:
        return next_version_dir(base, name)
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        path = next_version_dir(base, name)
        multihost_utils.sync_global_devices("version_dir")
        return path
    multihost_utils.sync_global_devices("version_dir")
    return latest_version_dir(base, name)


def run_single(cfg, mode: str, logger_save_dir: str) -> Dict[str, float]:
    import jax

    from ..utils import enable_compile_cache

    enable_compile_cache()
    if cfg.TPU.DEBUG_NANS:
        jax.config.update("jax_debug_nans", True)
    if cfg.TPU.MATMUL_PRECISION != "default":
        jax.config.update(
            "jax_default_matmul_precision", cfg.TPU.MATMUL_PRECISION
        )
    is_main = jax.process_index() == 0
    log_dir = allocate_version_dir(cfg.LOG_DIR, logger_save_dir)
    if is_main:
        print(f"Logging to {log_dir}")
        with open(os.path.join(log_dir, "config.yml"), "w") as f:
            f.write(cfg.dump())

    dataset = init_dataset(cfg.DATASETS.NAMES, cfg)
    dataset.print_statistics()
    # fail fast on configs whose evaluation would die mid-run (e.g. full
    # re-ranking against a streaming-scale val set at the first
    # EVAL_PERIOD eval, hours in)
    validate_rerank_config(cfg, dataset)

    if cfg.TEST.ONLY_TEST:
        model, params_model, batch_stats = load_model_for_test(cfg, dataset)
        logger = MetricsLogger(log_dir, "test", enabled=is_main)
        out: Dict[str, float] = {}
        # test twice with USE_CENTROIDS toggled (misc.py:136-139)
        for use_centroids in (
            cfg.MODEL.USE_CENTROIDS, not cfg.MODEL.USE_CENTROIDS
        ):
            val = run_validation(
                cfg, model, params_model, batch_stats, dataset,
                use_centroids=use_centroids,
            )
            tag = "centroids" if use_centroids else "plain"
            logger.log_metrics(
                {f"test_{tag}_{k}": v for k, v in val.items()}, step=0
            )
            out.update({f"test_{tag}_{k}": v for k, v in val.items()})
        logger.close()
        return out

    return fit(cfg, mode, log_dir, seed=cfg.REPRODUCIBLE_SEED,
               dataset=dataset)


def maybe_initialize_distributed():
    """Join a multi-host JAX cluster when launch env vars are present.

    The reference relies on Lightning to spin up DDP processes
    (utils/misc.py:101-119); the JAX equivalent is
    ``jax.distributed.initialize``, driven by the standard coordinator env
    (set by the TPU pod launcher). No-op on single-host runs.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        import jax

        if jax.process_count() == 1:  # not yet initialised
            jax.distributed.initialize()
            print(
                f"jax.distributed initialised: process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
            _warm_collectives()


def _warm_collectives():
    """Form the cross-process collective context while processes are still
    in lockstep (right after ``initialize``'s barrier).

    The first collective otherwise runs at the end of the first big step
    compile, and compile-time skew between processes (e.g. one hits the
    persistent cache, the other recompiles) can exceed the transport's
    hard context-setup deadline — XLA:CPU's Gloo key-value exchange times
    out at 30 s, which is exactly how tests/test_multihost.py used to
    flake under load."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices("collective-warmup")


def run_main(cfg, mode: str, logger_save_dir: str) -> Dict[str, float]:
    """Multi-run entry (misc.py:164-179)."""
    maybe_initialize_distributed()
    cfg.LOG_DIR = (
        f"logs/{cfg.DATASETS.NAMES}" if cfg.OUTPUT_DIR == "" else cfg.OUTPUT_DIR
    )
    out: Dict[str, float] = {}
    if cfg.REPRODUCIBLE:
        from ..utils import seed_everything

        base = cfg.REPRODUCIBLE_SEED
        for seed in range(base, base + cfg.REPRODUCIBLE_NUM_RUNS):
            cfg.REPRODUCIBLE_SEED = seed
            seed_everything(seed)
            out = run_single(cfg, mode, logger_save_dir)
            if out.get("preempted"):  # SIGTERM: no further seeds
                break
    else:
        for _ in range(cfg.REPRODUCIBLE_NUM_RUNS):
            out = run_single(cfg, mode, logger_save_dir)
            if out.get("preempted"):
                break
    return out
