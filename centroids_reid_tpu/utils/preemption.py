"""Graceful-preemption guard: SIGTERM -> checkpoint + clean exit.

The reference has no preemption handling (SURVEY.md §5: "failure
detection / elastic recovery: none beyond crash-resume") — a preempted
run dies where it stands and loses everything since the last periodic
checkpoint. On preemptible/spot TPU pools the maintenance notice IS a
SIGTERM with a short grace window, so the training loop turns the signal
into a clean epoch-boundary save it can resume from
(``MODEL.RESUME_TRAINING`` + the periodic ring, engine/fit.py).

Semantics:

- First signal: a flag is set; ``fit`` observes it at the next epoch
  boundary (epochs are seconds-scale on the device-resident path),
  saves a ring checkpoint for the finished epoch BEFORE any periodic
  validation (the grace window is for the save), skips the
  end-of-training double test, and returns with
  ``metrics["preempted"] = 1.0``. The multi-run loop
  (engine/runner.run_main) stops submitting further seeds.
- Second signal: the original disposition was restored when the first
  one fired, so a repeated SIGTERM terminates immediately — the
  operator's escalation path is never blocked by the graceful machinery.
- Multi-host: the signal may reach only some processes (spot
  reclamation notices are per-VM). ``should_stop`` is a collective —
  every process contributes its local flag and all of them observe the
  OR — so the whole job leaves the loop at the same epoch and no process
  is left waiting inside the epoch program's collectives.

Gated by ``TPU.GRACEFUL_PREEMPTION`` (default on; set False to keep the
process's default signal behaviour, e.g. under a supervisor that manages
checkpointing itself).
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional

import numpy as np


class PreemptionGuard:
    """Context manager installing one-shot graceful handlers.

    Use as ``with PreemptionGuard(enabled=...) as guard:`` around the
    epoch loop; poll ``guard.should_stop()`` once per epoch. Handlers
    are restored on exit, so nested/sequential ``fit`` calls in one
    process (tests, multi-run loops) never leak dispositions.

    ``enabled`` must be a value that is IDENTICAL on every process of a
    multi-host job (it comes from the shared config): when False,
    ``should_stop`` returns False without any collective, which is only
    symmetric if every process took the same branch.

    Signal handlers can only be installed from the main thread; when
    entered from a worker thread (some test harnesses) installation is
    skipped for THIS process only — its flag just stays False. The
    collective in ``should_stop`` still runs, so peers whose handlers
    did install keep their symmetric allgather partner and a signal on
    any main-thread process still stops the whole job.
    """

    def __init__(
        self,
        sigs: Iterable[int] = (signal.SIGTERM,),
        enabled: bool = True,
    ):
        self.signals = tuple(sigs)
        self.enabled = bool(enabled)
        self.installed = False
        self._flag = False
        self._previous: dict = {}

    # -- lifecycle --------------------------------------------------------
    def __enter__(self) -> "PreemptionGuard":
        if not self.enabled:
            return self
        if threading.current_thread() is not threading.main_thread():
            return self  # signal.signal would raise ValueError
        for s in self.signals:
            self._previous[s] = signal.signal(s, self._handle)
        self.installed = True
        return self

    def __exit__(self, *exc) -> None:
        for s, old in self._previous.items():
            try:
                # only restore what we still own: _handle already restored
                # the original disposition for the signal that fired
                # (== not `is`: each self._handle access creates a fresh
                # bound-method object; bound methods compare by value)
                if signal.getsignal(s) == self._handle:
                    signal.signal(s, old)
            except (ValueError, TypeError):  # pragma: no cover
                pass
        self._previous.clear()
        self.installed = False

    def _handle(self, signum, frame) -> None:
        self._flag = True
        # escalate: a second delivery of the same signal acts immediately
        old = self._previous.get(signum)
        if old is not None:
            try:
                signal.signal(signum, old)
            except (ValueError, TypeError):  # pragma: no cover
                pass

    # -- polling ----------------------------------------------------------
    @property
    def signalled(self) -> bool:
        """This process's local flag (no collective)."""
        return self._flag

    def should_stop(self, process_count: Optional[int] = None) -> bool:
        """Global stop decision; a collective when the job is multi-host.

        Every process for which the feature is ``enabled`` MUST call
        this at the same program point (the fit epoch boundary) — it
        allgathers the local flags so a signal delivered to ANY process
        stops ALL of them in lockstep. A process whose handler could not
        install (worker thread) still participates with a constant
        False flag; only ``enabled=False`` (config-off, identical
        everywhere) skips the collective.
        """
        if not self.enabled:
            return False
        if process_count is None:
            import jax

            process_count = jax.process_count()
        if process_count <= 1:
            return self._flag
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._flag, dtype=bool)
        )
        return bool(np.asarray(flags).any())
