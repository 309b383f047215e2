"""CLI surface checks: every entry point parses --help and rejects bad opts."""

import subprocess
import sys
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIS = [
    "train_ctl_model.py",
    "train_base_model.py",
    "inference/create_embeddings.py",
    "inference/get_similar.py",
    "scripts/convert_to_jpg.py",
    "scripts/street2shop2coco.py",
    "scripts/street2shop_coco2reid.py",
    "scripts/deep_fashion2reid.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, cli), "--help"],
        capture_output=True, timeout=240, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr.decode()[-500:]
    assert b"usage" in out.stdout.lower()


def test_train_cli_rejects_unknown_key():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "train_ctl_model.py"),
         "SOLVER.NOT_A_KEY", "1"],
        capture_output=True, timeout=240, env=env, cwd=ROOT,
    )
    assert out.returncode != 0
    assert b"Unknown config key" in out.stderr
