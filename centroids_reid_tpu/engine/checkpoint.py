"""Orbax checkpointing: best-metric + periodic ring + resume.

Replaces the reference's three mechanisms (SURVEY.md §5):
1. best-metric checkpoint monitoring mAP max (utils/misc.py:80-86);
2. periodic full-trainer checkpoints with ring retention of the newest
   n_saved (callbacks/chechpointer_callback.py:57-74);
3. backbone/full-model weight loading (handled by models/convert.py).

A checkpoint is the whole TrainState pytree (params incl. centers,
batch_stats, opt_state, step) plus the config YAML — the analogue of a
Lightning ckpt's hparams+state_dict (modelling/bases.py:63-64).

Multi-host: saves are process-0-only, mirroring the reference's rank-zero
guard (callbacks/chechpointer_callback.py:58, Lightning's rank_zero_only on
ModelCheckpoint). Under data parallelism every leaf of the train state is
fully replicated, so process 0 materialises its local replica to host
memory and writes a plain (single-process) orbax checkpoint; a global
barrier after the write keeps the ring/best pruning race-free. All
processes track ``best_metric`` (validation is deterministic and computed
identically on every host, engine/fit.py) so the best/not-best decision
never diverges.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _is_main() -> bool:
    return jax.process_index() == 0


def _barrier(name: str):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class CheckpointManager:
    """``use_async``: single-process saves go through orbax's
    AsyncCheckpointer — ``save()`` blocks only for the device->host
    snapshot (mandatory anyway: the train step donates the state buffers,
    so they must be read before the next step reuses them) and the
    serialisation/disk write overlaps training. Crash-safe ordering is
    preserved by DEFERRING destructive follow-ups (previous-best deletion,
    ring pruning) until the in-flight write has committed — they run at the
    next save/``wait()``/``close()``. Multi-host saves stay synchronous
    (the write itself is rank-0's, but orbax runs internal global barriers,
    and the sync protocol below is what the 2-process tests pin down)."""

    def __init__(self, root_dir: str, n_saved: int = 1, mode: str = "max",
                 use_async: bool = True):
        self.root = os.path.abspath(root_dir)
        self.auto_dir = os.path.join(self.root, "auto_checkpoints")
        self.best_dir = os.path.join(self.root, "checkpoints")
        os.makedirs(self.auto_dir, exist_ok=True)
        os.makedirs(self.best_dir, exist_ok=True)
        self.n_saved = n_saved
        self.mode = mode
        self.best_metric: Optional[float] = None
        self._async = bool(use_async) and jax.process_count() == 1
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if self._async else ocp.PyTreeCheckpointer()
        )
        self._deferred = []  # destructive follow-ups gated on commit

    def wait(self):
        """Block until any in-flight async save has committed, then run the
        deferred destructive follow-ups (in order)."""
        if self._async:
            self._ckptr.wait_until_finished()
        deferred, self._deferred = self._deferred, []
        for fn in deferred:
            fn()

    def close(self):
        self.wait()

    def _after_commit(self, fn):
        if self._async:
            self._deferred.append(fn)
        else:
            fn()

    # -- periodic ring ----------------------------------------------------
    def save_periodic(self, epoch: int, state, cfg=None):
        path = os.path.join(self.auto_dir, f"checkpoint_epoch{epoch}")
        self._save(path, state, cfg)
        # prune only after the new entry is durable (write-new-before-delete)
        self._after_commit(self._prune_ring)

    def _ring_entries(self):
        # strictly-numeric suffix only: a crash inside the (async) orbax
        # write window leaves "checkpoint_epochN.orbax-checkpoint-tmp-*"
        # dirs behind; they are NOT durable checkpoints and must neither
        # crash the int() parse (breaking resume) nor be offered for
        # restore/pruning.
        entries = []
        for d in os.listdir(self.auto_dir):
            if not d.startswith("checkpoint_epoch"):
                continue
            suffix = d.rsplit("epoch", 1)[1]
            if not suffix.isdigit():
                continue
            if os.path.isdir(os.path.join(self.auto_dir, d)):
                entries.append(d)
        return sorted(entries, key=lambda d: int(d.rsplit("epoch", 1)[1]))

    def _prune_ring(self):
        if not _is_main():
            return
        entries = self._ring_entries()
        while len(entries) > self.n_saved:
            victim = entries.pop(0)
            shutil.rmtree(os.path.join(self.auto_dir, victim), ignore_errors=True)
            sidecar = os.path.join(self.auto_dir, victim + ".cfg.yml")
            if os.path.exists(sidecar):
                os.remove(sidecar)

    # -- best-metric ------------------------------------------------------
    def save_if_best(self, epoch: int, state, metric: float, cfg=None) -> bool:
        better = (
            self.best_metric is None
            or (self.mode == "max" and metric > self.best_metric)
            or (self.mode == "min" and metric < self.best_metric)
        )
        if not better:
            return False
        self.best_metric = metric
        previous = list(os.listdir(self.best_dir)) if _is_main() else []
        path = os.path.join(self.best_dir, f"epoch={epoch}")
        self._save(path, state, cfg)
        if not _is_main():
            return True

        # delete the previous best only after the new one is fully written
        # (crash-safe ordering; the reference's atomic save is documented
        # but unimplemented, chechpointer_callback.py:26-30) — under async
        # saves this runs once the in-flight write has COMMITTED
        def _drop_previous():
            keep = {os.path.abspath(path), os.path.abspath(path + ".cfg.yml")}
            for d in previous:
                full = os.path.join(self.best_dir, d)
                if os.path.abspath(full) in keep:
                    continue
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                elif os.path.exists(full):
                    os.remove(full)

        self._after_commit(_drop_previous)
        print(f"Saved best checkpoint (metric={metric:.4f}) at {path}")
        return True

    # -- io ---------------------------------------------------------------
    def _save(self, path: str, state, cfg):
        if jax.process_count() > 1:
            # Every leaf is replicated under DP: materialise the local
            # replica to host numpy so orbax sees process-replicated values
            # (it writes them from the primary host only). All processes
            # MUST call save — orbax runs internal global barriers
            # ('Checkpointer:save_start'); a process-0-only call deadlocks.
            state = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                state,
            )
            if _is_main() and os.path.exists(path):
                shutil.rmtree(path)
            _barrier("ckpt_rm:" + os.path.basename(path))
            self._ckptr.save(path, state)
            if _is_main() and cfg is not None:
                with open(path + ".cfg.yml", "w") as f:
                    f.write(cfg.dump())
            _barrier("ckpt_save:" + os.path.basename(path))
            return
        # settle any in-flight write + its deferred deletions before
        # starting the next save (orbax allows one async save at a time)
        self.wait()
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        if cfg is not None:
            with open(path + ".cfg.yml", "w") as f:
                f.write(cfg.dump())

    def latest_periodic(self) -> Optional[str]:
        self.wait()  # an in-flight save must be durable before it is read
        entries = self._ring_entries()
        return os.path.join(self.auto_dir, entries[-1]) if entries else None


def restore_state(path: str, target_state):
    """Restore a TrainState saved by CheckpointManager (shape-checked).

    Array leaves are restored to HOST numpy, explicitly ignoring the
    sharding metadata orbax recorded at save time: a checkpoint written
    from an 8-device mesh must load on a single chip (and vice versa) —
    the Lightning-ckpt property the reference relies on for ONLY_TEST
    (utils/misc.py:128-139). Callers re-place the tree (fit() replicates
    over its mesh; the eval path device-puts through jit)."""
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = jax.tree.map(
        lambda x: ocp.RestoreArgs(restore_type=np.ndarray)
        if isinstance(x, (np.ndarray, jax.Array)) else ocp.RestoreArgs(),
        target_state,
    )
    restored = ckptr.restore(
        os.path.abspath(path), item=target_state, restore_args=restore_args
    )
    return restored


def epoch_of_checkpoint(path: str) -> Optional[int]:
    base = os.path.basename(os.path.normpath(path))
    for marker in ("checkpoint_epoch", "epoch="):
        if marker in base:
            try:
                return int(base.split(marker)[-1])
            except ValueError:
                return None
    return None
