"""The training loop (replaces pl.Trainer.fit for this framework).

Flow parity with /root/reference/utils/misc.py:73-161 and
modelling/bases.py:140-167: per-epoch LR schedule + warmup, epoch-seeded
resampling of the identity plan, periodic validation on the full val set,
best-mAP + periodic ring checkpoints, and the end-of-training double test
with USE_CENTROIDS toggled.

TPU shape: one jitted train step (donated state), device-side augmentation,
host->device transfer of uint8 batches only, G groups sharded over the data
mesh axis.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import TrainLoader, augment_batch, init_dataset
from ..data.device_data import bank_size_mb, build_image_bank, plan_to_arrays
from ..data.sampler import max_steps_bound
from ..models import create_model
from ..models.convert import load_pretrained_backbone, graft
from ..parallel import make_data_mesh, replicate, shard_batch
from ..solver import lr_for_epoch, set_learning_rate
from ..utils import PreemptionGuard, annotate, profile_trace
from .checkpoint import CheckpointManager, epoch_of_checkpoint, restore_state
from .epoch_runner import make_epoch_runner
from .evaluate import run_validation
from .logging import MetricsLogger
from .state import create_train_state
from .steps import make_train_step


def num_groups(cfg) -> int:
    return cfg.TPU.NUM_GROUPS or jax.device_count()


def build_model_and_state(cfg, dataset, seed: int = 0):
    model = create_model(cfg, num_classes=dataset.num_classes)
    state, tx = create_train_state(cfg, model, dataset.num_classes, seed=seed)

    if (
        cfg.MODEL.PRETRAINED
        and cfg.MODEL.PRETRAIN_PATH
        and not cfg.MODEL.RESUME_TRAINING
        and not cfg.TEST.ONLY_TEST
    ):
        # ImageNet/self-trained backbone weights (baseline.py:84-87)
        print("Loading pretrained model......")
        bb_params, bb_stats = load_pretrained_backbone(cfg.MODEL.PRETRAIN_PATH)
        params_model = graft(
            state.params["model"], {"backbone": bb_params}
        )
        batch_stats = graft(state.batch_stats, {"backbone": bb_stats})
        state = state.replace(
            params={**state.params, "model": params_model},
            batch_stats=batch_stats,
        )
    return model, state, tx


def fit(cfg, mode: str, log_dir: str, seed: int = 0,
        dataset=None) -> Dict[str, float]:
    """Train + periodic eval + final double test. Returns last metrics."""
    if dataset is None:
        dataset = init_dataset(cfg.DATASETS.NAMES, cfg)
        dataset.print_statistics()

    g = num_groups(cfg)
    mesh = make_data_mesh(g) if g > 1 else None
    model, state, tx = build_model_and_state(cfg, dataset, seed)
    train_step = jax.jit(
        make_train_step(model, tx, cfg, dataset.num_classes, mode),
        donate_argnums=0,
    )

    start_epoch = 0
    ckpt = CheckpointManager(
        log_dir, n_saved=1, mode=cfg.SOLVER.MONITOR_METRIC_MODE
    )
    if cfg.MODEL.RESUME_TRAINING and cfg.MODEL.PRETRAIN_PATH:
        state = restore_state(cfg.MODEL.PRETRAIN_PATH, state)
        resumed = epoch_of_checkpoint(cfg.MODEL.PRETRAIN_PATH)
        start_epoch = (resumed + 1) if resumed is not None else 0
        print(f"Resumed from {cfg.MODEL.PRETRAIN_PATH} at epoch {start_epoch}")

    if mesh is not None:
        state = replicate(mesh, state)

    if cfg.DATALOADER.SAMPLER != "random_identity":
        raise NotImplementedError(
            f"Unknown sampler {cfg.DATALOADER.SAMPLER!r}; only"
            " 'random_identity' exists (reference samplers/__init__.py:15-18)"
        )
    # multi-host: only process 0 writes logs/checkpoints (reference
    # rank-zero guard, callbacks/chechpointer_callback.py:58); every
    # process computes the same global plan and assembles only the groups
    # its local devices own
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    logger = MetricsLogger(log_dir, "train", enabled=is_main)
    logger.log_params({"mode": mode, "seed": seed, "config": cfg.dump()})
    g_local = g // n_proc
    loader = TrainLoader(
        dataset, cfg, num_groups=g,
        prefetch=cfg.TPU.PREFETCH_DEPTH,
        group_offset=jax.process_index() * g_local,
        local_groups=g_local,
    )
    mean = tuple(cfg.INPUT.PIXEL_MEAN)
    std = tuple(cfg.INPUT.PIXEL_STD)
    size_hw = tuple(cfg.INPUT.SIZE_TRAIN)
    dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32
    base_key = jax.random.PRNGKey(cfg.REPRODUCIBLE_SEED + 17 * seed)

    # device-resident fast path: whole train set in HBM, one scanned
    # program per epoch. Multi-host: each host decodes the full bank and
    # replicates it (assembled via make_array_from_process_local_data);
    # the plan arrays are group-sharded with each host contributing its
    # local group columns, so the scanned epoch is one global SPMD program.
    resident = (
        cfg.TPU.DEVICE_RESIDENT_DATA
        and bank_size_mb(dataset.train, size_hw) <= cfg.TPU.DEVICE_DATA_BUDGET_MB
    )
    image_bank = None
    run_epoch = None
    if resident:
        import concurrent.futures

        if is_main:
            print(
                f"Device-resident training data: "
                f"{bank_size_mb(dataset.train, size_hw):.0f} MB image bank"
            )
        run_epoch = make_epoch_runner(model, tx, cfg, dataset.num_classes, mode)
        # overlap the (CPU-bound) decode of the image bank with the
        # (remote/compiler-bound) AOT compile of the epoch program
        pool = concurrent.futures.ThreadPoolExecutor(1)
        bank_future = pool.submit(
            build_image_bank, dataset.train, size_hw,
            cfg.TPU.CACHE_IMAGES, cfg.DATALOADER.NUM_WORKERS,
        )
        compiled = None
        try:
            s_max0 = max_steps_bound(
                dataset.train_dict, cfg.SOLVER.IMS_PER_BATCH,
                cfg.DATALOADER.NUM_INSTANCE, g,
            )
            pk = cfg.SOLVER.IMS_PER_BATCH * cfg.DATALOADER.NUM_INSTANCE
            h, w = size_hw
            if mesh is None:
                def sds(shape, dt, _plan=False):
                    return jax.ShapeDtypeStruct(shape, dt)
                state_aval = state
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS

                repl = NamedSharding(mesh, P())
                plan_sh = NamedSharding(mesh, P(None, DATA_AXIS))

                def sds(shape, dt, _plan=False):
                    return jax.ShapeDtypeStruct(
                        shape, dt, sharding=plan_sh if _plan else repl
                    )

                state_aval = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype, sharding=x.sharding
                    ),
                    state,
                )
            compiled = run_epoch.lower(
                state_aval,
                sds((len(dataset.train), h, w, 3), jnp.uint8),
                sds((s_max0, g, pk), jnp.int32, True),
                sds((s_max0, g, pk), jnp.int32, True),
                sds((s_max0, g, pk), jnp.bool_, True),
                sds((s_max0,), jnp.bool_),
                sds((2,), jnp.uint32),
            ).compile()
        except Exception as e:  # pragma: no cover — fall back to lazy
            print(f"AOT epoch compile skipped ({type(e).__name__}: {e})")
        if n_proc > 1:
            # Runs UNCONDITIONALLY (success or not): if the AOT compile
            # failed on only one process, the others must not enter the
            # epoch program's collectives while it runs the lazy path —
            # exchange a success flag so every process takes the SAME
            # branch, then barrier. Barrier placement AFTER the compile:
            # the epoch program's first collective creates its communicator
            # context at first execution, and that setup has a hard
            # deadline (XLA:CPU Gloo: 30 s) which compile-time skew
            # between processes (cache hit on one, recompile on another)
            # would blow. The barrier's own context was formed right after
            # jax.distributed.initialize (runner._warm_collectives) so it
            # can absorb arbitrary skew.
            from jax.experimental import multihost_utils

            ok = multihost_utils.process_allgather(
                np.asarray(compiled is not None)
            )
            if not bool(np.asarray(ok).all()):
                if compiled is not None:  # pragma: no cover
                    print("AOT epoch compile discarded (failed on a peer)")
                compiled = None
            multihost_utils.sync_global_devices("epoch-program-compiled")
        if compiled is not None:
            run_epoch = compiled  # executable handle, no retrace later
        bank = bank_future.result()
        pool.shutdown()
        image_bank = (
            replicate(mesh, bank) if mesh is not None
            else jax.device_put(jnp.asarray(bank))
        )

    def _put_plan(x):
        """[S, G, ...] plan array -> group-sharded device array."""
        if mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS

        sh = NamedSharding(mesh, P(None, DATA_AXIS))
        if n_proc == 1:
            return jax.device_put(jnp.asarray(x), sh)
        g0 = jax.process_index() * g_local
        return jax.make_array_from_process_local_data(
            sh, np.asarray(x[:, g0:g0 + g_local])
        )

    def _put_replicated(x):
        if mesh is None:
            return jnp.asarray(x)
        return replicate(mesh, jnp.asarray(x)) if n_proc == 1 else replicate(
            mesh, np.asarray(x)
        )

    def _local_view(tree):
        """Host-local copy of replicated (global) arrays for validation.

        Multi-host policy (divergence from the reference's rank-0-only eval
        where other ranks idle at a barrier, modelling/bases.py:169,299-318):
        each process embeds its SLICE of the val set with this local copy,
        the embeddings are allgathered, and every process ranks the
        identical full set (engine/evaluate.extract_embeddings_sharded) —
        1/process_count of the extraction work each, and the same metric
        everywhere keeps the best-checkpoint decision consistent."""
        if n_proc == 1:
            return tree
        dev = jax.local_devices()[0]
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), dev), tree
        )

    metrics_out: Dict[str, float] = {}
    # graceful preemption: SIGTERM -> save at the epoch boundary, clean
    # exit for MODEL.RESUME_TRAINING (utils/preemption.py; the reference
    # has nothing past crash-resume, SURVEY.md §5)
    preempted = False
    guard = PreemptionGuard(enabled=cfg.TPU.GRACEFUL_PREEMPTION)
    with guard:
        for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCHS):
            lr = lr_for_epoch(epoch, cfg)
            set_learning_rate(state.opt_state, lr)
            # streaming path: fold the process index in so hosts draw distinct
            # augmentations for their local groups. The resident path is ONE
            # global SPMD program whose key input must be identical on every
            # process (augment keys are split per-image over the global [G,PK]
            # grid inside the program, so streams stay distinct per group).
            global_key = jax.random.fold_in(base_key, epoch)
            epoch_key = jax.random.fold_in(global_key, jax.process_index())

            t0 = time.time()
            # one profiler trace of the first trained epoch when TPU.PROFILE
            with profile_trace(
                log_dir, enabled=cfg.TPU.PROFILE and epoch == start_epoch
            ):
                if resident:
                    plan = loader.plan_for_epoch(epoch)
                    idx, labels, is_real = plan_to_arrays(plan, dataset.train)
                    n_steps = plan.num_steps
                    # pad every epoch to one static step count -> one compile
                    s_max = max_steps_bound(
                        dataset.train_dict, cfg.SOLVER.IMS_PER_BATCH,
                        cfg.DATALOADER.NUM_INSTANCE, g,
                    )
                    step_valid = np.zeros((s_max,), bool)
                    step_valid[:n_steps] = True
                    pad = s_max - n_steps
                    if pad:
                        def _pad(a):
                            return np.concatenate(
                                [a, np.repeat(a[-1:], pad, axis=0)], axis=0
                            )
                        idx, labels, is_real = map(_pad, (idx, labels, is_real))
                    state, mean_metrics = run_epoch(
                        state,
                        image_bank,
                        _put_plan(idx),
                        _put_plan(labels),
                        _put_plan(is_real),
                        _put_replicated(step_valid),
                        # always placed with the compiled program's expected
                        # (replicated) sharding — the AOT executable now also
                        # covers the mesh case
                        _put_replicated(global_key),
                    )
                    agg = {k: [v] for k, v in mean_metrics.items()}
                else:
                    agg = {}
                    n_steps = 0
                    for t, batch in enumerate(loader.epoch(epoch)):
                        with annotate("augment_dispatch"):
                            images = jnp.asarray(batch["images"])
                            is_real = jnp.asarray(batch["is_real"])
                            x = augment_batch(
                                images, is_real, jax.random.fold_in(epoch_key, t),
                                size_hw, cfg.INPUT.PADDING, mean, std,
                                cfg.INPUT.PROB, cfg.INPUT.RE_PROB, dtype=dtype,
                            )
                        device_batch = {
                            "images": x,
                            "labels": jnp.asarray(batch["labels"]),
                            "is_real": is_real,
                        }
                        if mesh is not None:
                            device_batch = shard_batch(mesh, device_batch)
                        with annotate("train_step_dispatch"):
                            state, step_metrics = train_step(state, device_batch)
                        n_steps += 1
                        for k, v in step_metrics.items():
                            agg.setdefault(k, []).append(v)

            # epoch end: one host sync for all step metrics
            epoch_metrics = {
                k: float(np.mean([float(x) for x in v])) for k, v in agg.items()
            }
            epoch_metrics["lr"] = lr
            epoch_metrics["epoch_time_s"] = time.time() - t0
            epoch_metrics["steps"] = n_steps
            # name mapping parity: epoch_train_loss, epoch_dist_ap/an
            epoch_metrics["epoch_train_loss"] = epoch_metrics.pop("loss", 0.0)
            if "step_dist_ap" in epoch_metrics:
                epoch_metrics["epoch_dist_ap"] = epoch_metrics.pop("step_dist_ap")
                epoch_metrics["epoch_dist_an"] = epoch_metrics.pop("step_dist_an")
            logger.log_metrics(epoch_metrics, step=epoch)
            if is_main:
                print(
                    f"epoch {epoch}: loss={epoch_metrics['epoch_train_loss']:.4f} "
                    f"lr={lr:.2e} steps={n_steps} "
                    f"({epoch_metrics['epoch_time_s']:.1f}s)"
                )

            # collective stop decision FIRST — before the (possibly
            # minutes-long) periodic validation, so the reclaimer's grace
            # window is spent on the save, not an eval. Every process
            # polls at this same point, so a SIGTERM delivered to ANY
            # host stops ALL of them at the same epoch (no process left
            # inside the next epoch's collectives).
            if guard.should_stop(n_proc):
                ckpt.save_periodic(epoch, state, cfg)
                preempted = True
                if is_main:
                    print(
                        f"Preemption signal received — saved "
                        f"checkpoint_epoch{epoch}, stopping cleanly. Resume "
                        f"with MODEL.RESUME_TRAINING True MODEL.PRETRAIN_PATH "
                        f"<auto_checkpoints/checkpoint_epoch{epoch}>"
                    )
                break
            if (epoch + 1) % cfg.SOLVER.EVAL_PERIOD == 0:
                val = run_validation(
                    cfg, model, _local_view(state.params["model"]),
                    _local_view(state.batch_stats),
                    dataset, use_centroids=cfg.MODEL.USE_CENTROIDS,
                )
                logger.log_metrics(val, step=epoch)
                metrics_out = val
                ckpt.save_if_best(
                    epoch, state, val[cfg.SOLVER.MONITOR_METRIC_NAME], cfg
                )
            if (epoch + 1) % cfg.TPU.PERIODIC_CHECKPOINT_INTERVAL == 0:
                ckpt.save_periodic(epoch, state, cfg)

    # end-of-training double test, both eval modes (misc.py:159-161) —
    # skipped on preemption (the grace window is for the save, not a full
    # double evaluation; callers see metrics["preempted"] and stop)
    final_modes = () if preempted else (
        cfg.MODEL.USE_CENTROIDS, not cfg.MODEL.USE_CENTROIDS
    )
    if preempted:
        metrics_out["preempted"] = 1.0
    for use_centroids in final_modes:
        val = run_validation(
            cfg, model, _local_view(state.params["model"]),
            _local_view(state.batch_stats),
            dataset, use_centroids=use_centroids,
        )
        tag = "centroids" if use_centroids else "plain"
        logger.log_metrics(
            {f"test_{tag}_{k}": v for k, v in val.items()},
            step=cfg.SOLVER.MAX_EPOCHS,
        )
        metrics_out.update({f"test_{tag}_{k}": v for k, v in val.items()})
    ckpt.close()  # settle any in-flight async save + deferred pruning
    logger.close()
    return metrics_out
