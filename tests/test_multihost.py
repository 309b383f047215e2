"""True multi-process data parallelism: 2 processes x 4 virtual CPU devices.

Validates the multi-host claims end-to-end: jax.distributed initialisation,
per-process local-group batch assembly (shard_batch ->
make_array_from_process_local_data), and gradient agreement across
processes (identical global loss on every process).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=proc_id,
)
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import create_train_state, make_train_step
from centroids_reid_tpu.models import create_model
from centroids_reid_tpu.parallel import make_data_mesh, shard_batch
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2 and jax.device_count() == 8
cfg = get_default_cfg()
cfg.MODEL.NAME = "resnet18"
cfg.USE_MIXED_PRECISION = False
cfg.INPUT.SIZE_TRAIN = [32, 16]
cfg.SOLVER.IMS_PER_BATCH = 2
num_classes = 8
model = create_model(cfg, num_classes=num_classes)
state, tx = create_train_state(cfg, model, num_classes, seed=0)
step = jax.jit(make_train_step(model, tx, cfg, num_classes, "ctl"))

mesh = make_data_mesh(8)
state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(x)
    ),
    state,
)
rng = np.random.RandomState(proc_id)
g_local, pk = 4, 8
labels = np.stack([np.repeat(rng.choice(num_classes, 2, replace=False), 4)
                   for _ in range(g_local)])
batch = shard_batch(mesh, {
    "images": rng.randn(g_local, pk, 32, 16, 3).astype(np.float32),
    "labels": labels.astype(np.int32),
    "is_real": np.ones((g_local, pk), bool),
})
state, metrics = step(state, batch)
print(f"LOSS {proc_id} {float(metrics['loss']):.6f}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("SKIP_MULTIHOST") == "1", reason="explicitly skipped"
)
def test_two_process_data_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # the worker resolves the repo root relative to its own path
    (tmp_path / "centroids_reid_tpu").symlink_to(
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "centroids_reid_tpu")
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    port = str(12000 + os.getpid() % 20000)  # avoid cross-run port clashes
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                _, pid, loss = line.split()
                losses[pid] = float(loss)
    assert set(losses) == {"0", "1"}, outs
    # the psum'd global loss must agree across processes
    assert losses["0"] == pytest.approx(losses["1"], abs=1e-6)
