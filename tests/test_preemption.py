"""Graceful-preemption subsystem (utils/preemption.py + fit/runner wiring).

The reference has no preemption handling (SURVEY.md §5: "failure
detection / elastic recovery: none beyond crash-resume") — these tests
pin the TPU-native addition: SIGTERM -> epoch-boundary ring save ->
clean exit with ``metrics["preempted"]`` -> resume from the saved ring
checkpoint.
"""

import glob
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from conftest import cpu_subprocess_env

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- guard unit tests ------------------------------------------------------

def test_guard_signal_flow_and_escalation():
    from centroids_reid_tpu.utils import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.signalled
        assert g.should_stop(process_count=1) is False
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.time() + 5
        while not g.signalled and time.time() < deadline:
            time.sleep(0.01)
        assert g.signalled
        assert g.should_stop(process_count=1) is True
        # escalation: the first delivery restored the original disposition,
        # so a second SIGTERM would act immediately (default: terminate)
        assert signal.getsignal(signal.SIGTERM) == before
    assert signal.getsignal(signal.SIGTERM) == before


def test_guard_restores_handler_on_exit_without_signal():
    from centroids_reid_tpu.utils import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert signal.getsignal(signal.SIGTERM) != before
        assert not g.should_stop(process_count=1)
    assert signal.getsignal(signal.SIGTERM) == before


def test_guard_disabled_is_inert():
    from centroids_reid_tpu.utils import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(enabled=False) as g:
        assert signal.getsignal(signal.SIGTERM) == before
        assert g.should_stop(process_count=1) is False
    assert signal.getsignal(signal.SIGTERM) == before


def test_guard_degrades_off_main_thread():
    """signal.signal raises off the main thread; the guard must skip
    installation for that process (some harnesses run fit() in worker
    threads) while KEEPING enabled=True — on multi-host the degraded
    process must still take the collective branch of should_stop, or a
    healthy job would hang with peers waiting in the allgather."""
    from centroids_reid_tpu.utils import PreemptionGuard

    result = {}

    def enter():
        g = PreemptionGuard()
        with g:
            result["enabled"] = g.enabled
            result["installed"] = g.installed
            result["stop"] = g.should_stop(process_count=1)

    t = threading.Thread(target=enter)
    t.start()
    t.join(10)
    assert result == {"enabled": True, "installed": False, "stop": False}


# --- end-to-end: CLI run preempted mid-training, then resumed --------------

def test_cli_sigterm_saves_and_resumes(tmp_path):
    """SIGTERM mid-run: the CLI saves a ring checkpoint at the epoch
    boundary, skips the final double test, exits 0; a resume run picks up
    at the following epoch. PERIODIC_CHECKPOINT_INTERVAL is set beyond
    MAX_EPOCHS so the only ring save is the preemption-triggered one."""
    from test_integration import _make_separable_market

    root = _make_separable_market(tmp_path)
    out_dir = str(tmp_path / "logs")
    common = [
        "DATASETS.ROOT_DIR", root,
        "MODEL.NAME", "resnet18", "MODEL.PRETRAINED", "False",
        "USE_MIXED_PRECISION", "False",
        "INPUT.SIZE_TRAIN", "[32,16]", "INPUT.SIZE_TEST", "[32,16]",
        "SOLVER.IMS_PER_BATCH", "4", "SOLVER.USE_WARMUP_LR", "False",
        "DATALOADER.USE_RESAMPLING", "False", "REPRODUCIBLE_NUM_RUNS", "1",
        "TPU.NUM_GROUPS", "1", "OUTPUT_DIR", out_dir,
    ]
    env = cpu_subprocess_env()
    log = tmp_path / "run.log"
    with open(log, "wb") as lf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "train_ctl_model.py"),
             *common,
             "SOLVER.MAX_EPOCHS", "50", "SOLVER.EVAL_PERIOD", "50",
             "TPU.PERIODIC_CHECKPOINT_INTERVAL", "100"],
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=ROOT,
        )
        # wait for the first epoch line — printed INSIDE the guard context,
        # so the signal is guaranteed to hit the installed handler
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail(
                    "training exited before it could be preempted:\n"
                    + log.read_text()[-2000:]
                )
            if "epoch 0:" in log.read_text(errors="replace"):
                break
            time.sleep(0.5)
        else:
            proc.kill()
            pytest.fail("never reached epoch 0:\n" + log.read_text()[-2000:])
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)

    text = log.read_text(errors="replace")
    assert rc == 0, text[-2000:]
    assert "Preemption signal received" in text
    # final double test skipped on preemption
    assert "test_centroids" not in text
    autos = [
        a for a in glob.glob(os.path.join(
            out_dir, "*", "version_*", "auto_checkpoints",
            "checkpoint_epoch*"))
        if os.path.isdir(a)
    ]
    assert len(autos) == 1, autos
    saved_epoch = int(autos[0].rsplit("epoch", 1)[1])
    assert saved_epoch < 50

    # resume: one more epoch, then the full final double test
    log2 = tmp_path / "resume.log"
    with open(log2, "wb") as lf:
        rc2 = subprocess.call(
            [sys.executable, os.path.join(ROOT, "train_ctl_model.py"),
             *common,
             "MODEL.RESUME_TRAINING", "True",
             "MODEL.PRETRAIN_PATH", autos[0],
             "SOLVER.MAX_EPOCHS", str(saved_epoch + 2),
             "SOLVER.EVAL_PERIOD", "1000",
             "TPU.PERIODIC_CHECKPOINT_INTERVAL", "1"],
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=ROOT,
            timeout=900,
        )
    text2 = log2.read_text(errors="replace")
    assert rc2 == 0, text2[-2000:]
    assert f"at epoch {saved_epoch + 1}" in text2  # "Resumed from ..."
    assert f"epoch {saved_epoch + 1}:" in text2    # actually trained it
    # final double test ran: both eval modes logged to metrics.jsonl
    jsonl = glob.glob(os.path.join(
        out_dir, "*", "version_*", "train", "metrics.jsonl"))
    logged = "".join(open(p).read() for p in jsonl)
    assert "test_centroids_mAP" in logged and "test_plain_mAP" in logged
    # ...and the preempted run skipped it (its jsonl has no test_ rows)
    first = min(jsonl)  # version_0 sorts before version_1
    assert "test_centroids_mAP" not in open(first).read()
