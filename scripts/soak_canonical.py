#!/usr/bin/env python
"""Canonical 120-epoch dress rehearsal as a SYSTEM soak.

Runs the reference's canonical Market1501 CTL recipe
(train_scripts/market1501/train_ctl_model_s_r50_market1501.sh +
configs/256_resnet50.yml: ResNet-50 256x128 fp32, P=16 x K=4, Adam
3.5e-4, MultiStep(40,70)x0.1, 10-epoch warmup, EVAL_PERIOD 5) end to end
on a synthetic Market-SCALE dataset (751 pids / ~12.8k train / ~3k query
/ ~15.8k gallery, separable colour+noise), exercising the whole system
the way a production run would:

1. train to ``--preempt-at`` epochs, then SIGTERM -> graceful preemption
   checkpoint (utils/preemption.py);
2. resume from the preemption checkpoint and run to 120 + the final
   double test (centroids on/off, /root/reference/utils/misc.py:159-161);
3. per-epoch wall-time series from both runs (the resume seam and any
   recompile shows up as an outlier);
4. the accuracy-parity gate dry-run (scripts/assert_parity.py) on the
   resulting best checkpoint, PLUS the int8 deployment gate at its
   DEFAULT 1% tolerance on a hard (unsaturated) eval set — per-image
   colour shifts push fp32 mAP meaningfully below 1.0, so the int8
   shortfall the gate bounds measures quantization, not a ceiling.

Emits ONE JSON line with the epoch-time stats, metric trajectory and
gate results. Divergence from the canonical recipe: MODEL.PRETRAINED
False — no ImageNet weights ship in this environment (the reference
downloads them, modelling/baseline.py:84-87).

Usage:  python scripts/soak_canonical.py --work /tmp/soak [--epochs 120]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_PIDS = 751
TRAIN_PER_PID = 17     # 751*17 = 12,767  (Market: 12,936)
QUERY_PER_PID = 4      # 751*4  = 3,004   (Market: 3,368)
GALLERY_PER_PID = 21   # 751*21 = 15,771  (Market: 15,913)


def _pid_colors():
    """The soak's pid->colour table: a 3d grid with margin >> noise so 751
    classes separate; shared by the clean train/eval set AND the hard eval
    set (same identities, harder images)."""
    import numpy as np

    rng = np.random.RandomState(0)
    grid = np.linspace(25, 230, 10).astype(np.int64)
    colors = np.stack(np.meshgrid(grid, grid, grid), -1).reshape(-1, 3)
    return colors[rng.permutation(len(colors))[:N_PIDS]]


def make_dataset(root: str, hw=(256, 128)) -> None:
    """Market-scale separable synthetic set in market1501 layout (one
    solid colour per pid + noise; camid patterns keep every query
    matchable under the same-pid+camid removal rule)."""
    import numpy as np
    from PIL import Image

    base = os.path.join(root, "market1501")
    done = os.path.join(base, ".soak_complete")
    if os.path.exists(done):
        print(f"dataset already at {base}")
        return
    rng = np.random.RandomState(0)
    colors = _pid_colors()
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    t0 = time.time()
    for pid in range(N_PIDS):
        c = colors[pid][None, None, :]

        def write(subdir, camid, i):
            arr = np.clip(
                c + rng.randint(-18, 18, (hw[0], hw[1], 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(
                base, subdir, f"{pid + 1:04d}_c{camid}s1_{i:06d}_00.jpg"
            ), "JPEG", quality=80)

        for i in range(TRAIN_PER_PID):
            write("bounding_box_train", (i % 6) + 1, i)
        for i in range(QUERY_PER_PID):
            write("query", 1, 1000 + i)
        for i in range(GALLERY_PER_PID):
            write("bounding_box_test", (i % 5) + 2, 2000 + i)
        if pid % 100 == 0:
            print(f"  pid {pid}/{N_PIDS} ({time.time() - t0:.0f}s)",
                  flush=True)
    open(done, "w").write("ok")
    print(f"dataset written in {time.time() - t0:.0f}s")


HARD_SHIFT = 30        # per-image colour shift amplitude: ~1.3x the
                       # ~23-unit inter-class grid spacing, targeting a
                       # mid-range fp32 mAP (see below)


def make_hard_eval_dataset(clean_root: str, root: str,
                           hw=(256, 128)) -> None:
    """UNSATURATED eval set for the int8 deployment gate (VERDICT r4 #6):
    same 751 identities, but every query/gallery image's base colour is
    shifted by a per-IMAGE uniform offset in [-HARD_SHIFT, HARD_SHIFT]^3 —
    a bit above the ~23-unit inter-class grid spacing, so identities
    bleed into their colour-space neighbours and the converged model's
    fp32 mAP lands meaningfully below 1.0. Per-pixel noise alone cannot do
    this (global pooling averages iid pixel noise to ~0), which is why the
    clean set saturates. The train split is shared with the clean set (the
    dataset factory requires it; ONLY_TEST never reads the images).

    On a non-saturated metric the gate's int8-vs-fp32 shortfall measures
    QUANTIZATION, not a ceiling — so the soak runs it at the default 1%
    tolerance (assert_parity.py --int8) instead of a loosened one.
    """
    import shutil

    import numpy as np
    from PIL import Image

    base = os.path.join(root, "market1501")
    done = os.path.join(base, ".soak_hard_complete")
    if os.path.exists(done):
        print(f"hard eval set already at {base}")
        return
    clean_train = os.path.join(clean_root, "market1501",
                               "bounding_box_train")
    os.makedirs(base, exist_ok=True)
    train_link = os.path.join(base, "bounding_box_train")
    if os.path.islink(train_link) and not os.path.exists(train_link):
        os.remove(train_link)  # dangling link from an earlier failed run
    if not os.path.lexists(train_link):
        try:
            os.symlink(clean_train, train_link)
        except OSError:  # filesystems without symlink support
            shutil.copytree(clean_train, train_link)
    for sub in ("query", "bounding_box_test"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    rng = np.random.RandomState(1)
    colors = _pid_colors()
    t0 = time.time()
    for pid in range(N_PIDS):
        c = colors[pid][None, None, :]

        def write(subdir, camid, i):
            shift = rng.randint(-HARD_SHIFT, HARD_SHIFT + 1, (1, 1, 3))
            arr = np.clip(
                c + shift + rng.randint(-18, 18, (hw[0], hw[1], 3)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(
                base, subdir, f"{pid + 1:04d}_c{camid}s1_{i:06d}_00.jpg"
            ), "JPEG", quality=80)

        for i in range(QUERY_PER_PID):
            write("query", 1, 1000 + i)
        for i in range(GALLERY_PER_PID):
            write("bounding_box_test", (i % 5) + 2, 2000 + i)
        if pid % 150 == 0:
            print(f"  hard-set pid {pid}/{N_PIDS} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    open(done, "w").write("ok")
    print(f"hard eval set written in {time.time() - t0:.0f}s")


CANONICAL = [
    "--config_file", os.path.join(ROOT, "configs", "256_resnet50.yml"),
    "DATASETS.NAMES", "market1501",
    "SOLVER.IMS_PER_BATCH", "16",
    "TEST.IMS_PER_BATCH", "128",
    "SOLVER.BASE_LR", "0.00035",
    "DATALOADER.USE_RESAMPLING", "False",
    "USE_MIXED_PRECISION", "False",  # fp32, per the reference script
    "MODEL.USE_CENTROIDS", "True",
    "MODEL.PRETRAINED", "False",   # no ImageNet weights in this env
    "REPRODUCIBLE_NUM_RUNS", "1",
]


def launch(extra, log_path):
    lf = open(log_path, "ab")
    return subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "train_ctl_model.py")]
        + CANONICAL + extra,
        stdout=lf, stderr=subprocess.STDOUT, cwd=ROOT,
    ), lf


EPOCH_RE = re.compile(
    r"epoch (\d+): loss=([\d.]+).*\(([\d.]+)s\)"
)


def version_dirs(out_dir):
    """Run version dirs under OUTPUT_DIR, oldest first. The runner nests
    output at <OUTPUT_DIR>/<experiment>/version_N (engine/runner.py:79 via
    allocate_version_dir) and CheckpointManager roots auto_checkpoints/ +
    checkpoints/ at that version dir (engine/checkpoint.py:61-62)."""
    dirs = glob.glob(os.path.join(out_dir, "*", "version_*"))
    return sorted(dirs, key=lambda d: (os.path.getmtime(d), d))


def find_preempt_ckpt(out_dir):
    """Latest graceful-preemption checkpoint across all run versions."""
    best = None
    for vd in version_dirs(out_dir):
        auto = os.path.join(vd, "auto_checkpoints")
        if not os.path.isdir(auto):
            continue
        for d in os.listdir(auto):
            m = re.fullmatch(r"checkpoint_epoch(\d+)", d)
            if m and os.path.isdir(os.path.join(auto, d)):
                ep = int(m.group(1))
                if best is None or ep > best[0]:
                    best = (ep, os.path.join(auto, d))
    return best[1] if best else None


def find_best_ckpt(out_dir):
    """Most recent best-metric checkpoint (checkpoints/epoch=N)."""
    for vd in reversed(version_dirs(out_dir)):
        bd = os.path.join(vd, "checkpoints")
        if os.path.isdir(bd):
            cand = sorted(
                (d for d in os.listdir(bd)
                 if os.path.isdir(os.path.join(bd, d))),  # not .cfg.yml
                key=lambda d: int(re.sub(r"\D", "", d) or 0),
            )
            if cand:
                return os.path.join(bd, cand[-1])
    return None


def tail_epochs(log_path):
    out = {}
    try:
        text = open(log_path, errors="replace").read()
    except OSError:
        return out
    for m in EPOCH_RE.finditer(text):
        out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def parse_parity_json(text: str):
    """Last PARITY_JSON line a gate printed, as a dict (None if absent)."""
    out = None
    for line in text.splitlines():
        if line.startswith("PARITY_JSON "):
            out = json.loads(line[len("PARITY_JSON "):])
    return out


def run_hard_int8_gate(work: str, clean_ds: str, ckpt: str) -> dict:
    """int8 deployment gate AT THE DEFAULT 1% TOLERANCE on the hard
    (unsaturated) eval set: builds the set, runs assert_parity --int8 with
    no --int8-tol override, and returns the measured fp32 baseline + int8
    shortfall. Additionally asserts the fp32 mAP really is unsaturated
    (<= 0.995) — a gate whose baseline sits at 1.0 discriminates nothing
    (VERDICT r4 #6)."""
    hard_ds = os.path.join(work, "hard_data")
    make_hard_eval_dataset(clean_ds, hard_ds)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "assert_parity.py"),
         "--config_file",
         os.path.join(ROOT, "configs", "256_resnet50.yml"),
         "--ckpt", ckpt, "--root", hard_ds, "--dataset", "market1501",
         # full-range bands: the hard set's absolute level is a fixture
         # property, not the assertion — the int8 shortfall at default
         # tol and the explicit unsaturation check below are. Asserting
         # both centroid metrics also selects them as the int8-gated set
         # (assert_parity gates the table's metrics); at 3,004 queries a
         # 1% Top-1 bound is ~30 flips — meaningful
         "--expect", "test_centroids_mAP=0.50:0.50",
         "--expect", "test_centroids_Top-1=0.50:0.50",
         "--int8",
         "MODEL.PRETRAINED", "False", "TEST.IMS_PER_BATCH", "128",
         "TPU.INT8_CALIB_BATCHES", "2",
         "OUTPUT_DIR", os.path.join(work, "hard_gate_logs")],
        capture_output=True, cwd=ROOT, timeout=3600,
    )
    open(os.path.join(work, "hard_gate.log"), "wb").write(
        r.stdout + r.stderr
    )
    rep = parse_parity_json(r.stdout.decode(errors="replace")) or {}
    fp32_map = rep.get("fp32", {}).get("test_centroids_mAP")
    unsaturated = fp32_map is not None and fp32_map <= 0.995
    return {
        "hard_gate": ("PASS" if r.returncode == 0 and unsaturated
                      else "FAIL"),
        "hard_gate_fp32_mAP": fp32_map,
        "hard_gate_fp32_Top1": rep.get("fp32", {}).get(
            "test_centroids_Top-1"),
        "hard_gate_int8_tol": rep.get("int8_tol"),
        "hard_gate_int8_shortfall": rep.get("int8_shortfall"),
        "hard_gate_unsaturated": unsaturated,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/soak")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--preempt-at", type=int, default=51,
                    help="SIGTERM once this epoch's line appears")
    ap.add_argument("--skip-parity-gate", action="store_true")
    ap.add_argument("--reuse-phase1", action="store_true",
                    help="skip phase 1 if an earlier run already left a "
                         "preempted train.log + checkpoint in --work")
    ap.add_argument("--gate-only", action="store_true",
                    help="re-run ONLY phase 3 (the parity + hard-int8 "
                         "gates) against the checkpoints an earlier soak "
                         "left in --work; prints a gate-only JSON line")
    args = ap.parse_args()

    if args.gate_only:
        ds = os.path.join(args.work, "data")
        out_dir = os.path.join(args.work, "logs")
        target = find_best_ckpt(out_dir) or find_preempt_ckpt(out_dir)
        assert target, f"no checkpoints under {out_dir} — run the soak first"
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "assert_parity.py"),
             "--config_file",
             os.path.join(ROOT, "configs", "256_resnet50.yml"),
             "--ckpt", target, "--root", ds, "--dataset", "market1501",
             "--expect", "test_centroids_mAP=0.95:0.05",
             "--expect", "test_centroids_Top-1=0.95:0.05",
             "MODEL.PRETRAINED", "False", "TEST.IMS_PER_BATCH", "128",
             "OUTPUT_DIR", os.path.join(args.work, "gate_logs")],
            capture_output=True, cwd=ROOT, timeout=3600,
        )
        open(os.path.join(args.work, "gate.log"), "wb").write(
            r.stdout + r.stderr
        )
        hard = run_hard_int8_gate(args.work, ds, target)
        print("SOAK_GATE " + json.dumps({
            "parity_gate": "PASS" if r.returncode == 0 else "FAIL",
            **hard,
        }))
        return

    os.makedirs(args.work, exist_ok=True)
    ds = os.path.join(args.work, "data")
    make_dataset(ds)
    out_dir = os.path.join(args.work, "logs")
    log = os.path.join(args.work, "train.log")
    common = ["DATASETS.ROOT_DIR", ds,
              "SOLVER.MAX_EPOCHS", str(args.epochs),
              "OUTPUT_DIR", out_dir]

    # ---- phase 1: train until the preemption signal ----------------------
    t0 = time.time()
    reusing = (args.reuse_phase1 and os.path.exists(log)
               and "Preemption signal received"
               in open(log, errors="replace").read()
               and find_preempt_ckpt(out_dir) is not None)
    if reusing:
        print("reusing completed phase 1 from an earlier run", flush=True)
        epochs_a = tail_epochs(log)
        preempted_epoch = max(epochs_a)
    else:
        # a rerun into the same --work (without --reuse-phase1) must not
        # let the monitor parse a previous run's epoch lines — launch()
        # appends, so stale 'epoch 52' text would trip the SIGTERM on
        # the first poll and the summary would mix two runs
        if os.path.exists(log):
            os.remove(log)
        proc, lf = launch(common, log)
        preempted_epoch = None
        try:
            while proc.poll() is None:
                ep = tail_epochs(log)
                if ep and max(ep) >= args.preempt_at:
                    preempted_epoch = max(ep)
                    print(f"sending SIGTERM at epoch {preempted_epoch}",
                          flush=True)
                    proc.send_signal(signal.SIGTERM)
                    break
                time.sleep(10)
            rc = proc.wait(timeout=900)
        finally:
            lf.close()
        if preempted_epoch is None:
            raise SystemExit(f"run ended (rc={rc}) before epoch "
                             f"{args.preempt_at} — see {log}")
        if rc != 0:
            raise SystemExit(f"preempted run exited {rc} — see {log}")
        text = open(log, errors="replace").read()
        assert "Preemption signal received" in text, "no graceful preemption"
        epochs_a = tail_epochs(log)

    resume_from = find_preempt_ckpt(out_dir)
    assert resume_from, f"no auto_checkpoints/checkpoint_epoch* under {out_dir}"
    print(f"phase 1 done in {time.time() - t0:.0f}s; resume from "
          f"{resume_from}", flush=True)

    # ---- phase 2: resume to completion + final double test ---------------
    t1 = time.time()
    log2 = os.path.join(args.work, "resume.log")
    if os.path.exists(log2):
        os.remove(log2)  # same staleness hazard as train.log above
    proc, lf = launch(
        common + ["MODEL.RESUME_TRAINING", "True",
                  "MODEL.PRETRAIN_PATH", resume_from], log2,
    )
    try:
        rc = proc.wait()
    finally:
        lf.close()
    if rc != 0:
        raise SystemExit(f"resumed run exited {rc} — see {log2}")
    text2 = open(log2, errors="replace").read()
    assert "Resumed from" in text2
    epochs_b = tail_epochs(log2)
    # final double test = centroid AND plain eval blocks at the end
    n_centroid_evals = text2.count("Evaluation is done using centroids")
    print(f"phase 2 done in {time.time() - t1:.0f}s", flush=True)

    # ---- phase 3: parity-gate dry-run on the result ----------------------
    gate, hard = "skipped", {"hard_gate": "skipped"}
    if not args.skip_parity_gate:
        target = find_best_ckpt(out_dir) or resume_from
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "assert_parity.py"),
             "--config_file",
             os.path.join(ROOT, "configs", "256_resnet50.yml"),
             "--ckpt", target, "--root", ds, "--dataset", "market1501",
             "--expect", "test_centroids_mAP=0.95:0.05",
             "--expect", "test_centroids_Top-1=0.95:0.05",
             "MODEL.PRETRAINED", "False", "TEST.IMS_PER_BATCH", "128",
             "OUTPUT_DIR", os.path.join(args.work, "gate_logs")],
            capture_output=True, cwd=ROOT, timeout=3600,
        )
        gate = "PASS" if r.returncode == 0 else "FAIL"
        open(os.path.join(args.work, "gate.log"), "wb").write(
            r.stdout + r.stderr
        )
        hard = run_hard_int8_gate(args.work, ds, target)

    # ---- summary ---------------------------------------------------------
    times_a = [t for _, (_, t) in sorted(epochs_a.items())]
    times_b = [t for e, (_, t) in sorted(epochs_b.items())
               if e > max(epochs_a)]
    all_t = times_a[1:] + times_b  # epoch 0 carries the compile
    import statistics

    summary = {
        "epochs_total": args.epochs,
        "phase1_reused": reusing,
        "preempted_at": preempted_epoch,
        "resume_from": os.path.basename(resume_from),
        "epoch0_s": times_a[0] if times_a else None,
        "steady_epoch_s_median": round(statistics.median(all_t), 2),
        "steady_epoch_s_max": round(max(all_t), 2),
        "first_resumed_epoch_s": round(times_b[0], 2) if times_b else None,
        "total_wall_s": round(time.time() - t0, 1),
        "final_double_test": n_centroid_evals >= 1 and "mAP" in text2,
        "parity_gate": gate,
        **hard,
        "losses_tail": [
            round(loss, 4) for _, (loss, _) in sorted(epochs_b.items())
        ][-5:],
    }
    print("SOAK " + json.dumps(summary))


if __name__ == "__main__":
    main()
