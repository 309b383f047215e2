"""centroids_reid_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the
capabilities of mikwieczorek/centroids-reid ("On the Unreasonable Effectiveness
of Centroids in Image Retrieval", ICONIP 2021).

Design notes
------------
This is not a port. The reference is a PyTorch-Lightning application; this
framework is built TPU-first:

* models are Flax modules in NHWC layout, compiled once under ``jax.jit``;
* the CTL leave-one-instance-slot-out centroid loss is a fully vectorised
  masked computation (the reference loops over instance slots in Python,
  see /root/reference/train_ctl_model.py:112-140);
* data parallelism is expressed as a ``jax.sharding.Mesh`` + sharding
  annotations (the reference delegates to Lightning DDP/NCCL);
* retrieval math (QxG distance matrix + top-k) runs as tiled Pallas kernels
  sized to the MXU;
* augmentation runs on-device (the host may have very few cores).
"""

__version__ = "0.1.0"
