"""Device mesh and sharding helpers.

The reference's only parallelism is data parallelism via Lightning DDP/NCCL
(SURVEY.md §2.11). The TPU-native equivalent: a 1-D ``jax.sharding.Mesh``
over the ``data`` axis; the global batch leads with a *group* dimension that
is sharded over it, parameters are replicated, and XLA inserts the gradient
all-reduce. Hard-example mining and BN batch statistics are computed per
group (vmap over the group axis), which reproduces per-rank DDP semantics
exactly — each DDP rank mines triplets only within its local P x K batch.

Retrieval additionally uses a ``gallery`` axis: the Q x G distance + top-k
work is sharded over gallery rows (the "scale" subsystem replacing the
reference's >30k-row host chunking, utils/reid_metric.py:93-110).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GALLERY_AXIS = "gallery"


def shard_map(f, *, mesh, in_specs, out_specs):
    """``jax.shard_map`` with replication checking off, on both API
    generations: jax >= 0.8 exposes ``jax.shard_map`` (``check_vma``),
    older releases only ``jax.experimental.shard_map`` (``check_rep``).
    All call sites here hand-place collectives (psum/all_gather over the
    mesh axis), which the static rep/vma checker rejects."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map as _shard_map

    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def make_retrieval_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (GALLERY_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def group_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading group axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def gallery_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(GALLERY_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree (leading dim = groups) sharded over data axis.

    Single-host: a plain device_put. Multi-host: each process holds only
    its local groups (see TrainLoader group_offset/local_groups) and the
    global array is assembled from the per-process shards.
    """
    sh = group_sharded(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a host pytree over the mesh.

    Multi-host: every process holds an identical full copy (seeded
    identically / same files), so the global replicated array is assembled
    from per-process local data.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )
