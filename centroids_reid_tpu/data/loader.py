"""Host-side batch assembly with background prefetch.

The reference uses torch DataLoader worker processes for decode+augment
(utils/misc.py:165, datasets/bases.py:116-124). Here the host only decodes
and resizes (optionally from an in-RAM uint8 cache); augmentation runs
on-device (transforms.py). A background thread assembles the next uint8
batch while the TPU executes the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .datasets import Record, ReidDataset
from .sampler import EpochPlan, build_epoch_plan
from .transforms import load_and_pack_yuv420, load_and_resize


class ImageStore:
    """Decoded-and-resized uint8 image provider with optional RAM cache.

    ``fmt="rgb"`` (default, bit-exact parity path) yields [H, W, 3];
    ``fmt="yuv420"`` yields packed planar YUV420 [1.5*H*W] for the
    serving fast-ingest path (TPU.FAST_DECODE) — half the bytes shipped
    host->device, unpacked inside the embed program
    (transforms.py::yuv420_to_rgb)."""

    def __init__(self, size_hw: Tuple[int, int], cache: bool = True,
                 fmt: str = "rgb"):
        if fmt not in ("rgb", "yuv420"):
            raise ValueError(f"unknown ImageStore fmt {fmt!r}")
        self.size_hw = tuple(size_hw)
        self.cache_enabled = cache
        self.fmt = fmt
        self._load = (
            load_and_resize if fmt == "rgb" else load_and_pack_yuv420
        )
        self._cache: Dict[str, np.ndarray] = {}

    def item_shape(self) -> Tuple[int, ...]:
        # shared with the serving surfaces (transforms.ingest_item_shape);
        # yuv420 requires even dims (rgb_to_yuv420_np raises otherwise),
        # where 1.5*H*W is the exact packed length
        from .transforms import ingest_item_shape

        return ingest_item_shape(self.fmt, self.size_hw)

    def get(self, path: str) -> np.ndarray:
        if self.cache_enabled:
            img = self._cache.get(path)
            if img is None:
                img = self._load(path, self.size_hw)
                self._cache[path] = img
            return img
        return self._load(path, self.size_hw)

    def get_many(self, paths: List[str], out: np.ndarray,
                 n_threads: int = 0) -> None:
        """Fill ``out[i]`` for each path — cache hits copied, misses
        decoded through the native GIL-free batch entry (decode threads
        scale with host cores; identical bytes to per-image ``get``,
        tests/test_data.py). Non-JPEG/corrupt images fall back to the
        per-image path exactly like ``get`` would."""
        from .. import native

        missing = []
        for i, p in enumerate(paths):
            img = self._cache.get(p) if self.cache_enabled else None
            if img is None:
                missing.append(i)
            else:
                out[i] = img
        if not missing:
            return
        blobs = []
        for i in missing:
            try:
                with open(paths[i], "rb") as f:
                    blobs.append(f.read())
            except OSError:
                blobs.append(b"")
        batch_fn = (
            native.decode_resize_batch if self.fmt == "rgb"
            else native.decode_fast_batch
        )
        res = batch_fn(blobs, self.size_hw, n_threads=n_threads)
        if res is None:  # native library unavailable: per-image fallback
            for i in missing:
                out[i] = self.get(paths[i])
            return
        decoded, failed = res
        failed = set(failed)
        for j, i in enumerate(missing):
            if j in failed:
                out[i] = self._load(paths[i], self.size_hw)  # PIL path
            else:
                out[i] = decoded[j]
            if self.cache_enabled:
                self._cache[paths[i]] = out[i].copy()


class TrainLoader:
    """Yields per-step host batches for the P x K identity trainer.

    Batch dict (all numpy, group-major):
      images  [G, P*K, H, W, 3] uint8 (mock slots zero)
      labels  [G, P*K] int32
      camids  [G, P*K] int32
      is_real [G, P*K] bool
    """

    def __init__(self, dataset: ReidDataset, cfg, num_groups: int,
                 prefetch: int = 2, group_offset: int = 0,
                 local_groups: Optional[int] = None):
        """``num_groups`` is the GLOBAL group count (the sampling plan is
        identical on every host); this loader assembles only groups
        [group_offset, group_offset + local_groups) — the multi-host
        equivalent of the reference's rank-sharded sampler
        (distributed_pids_sampler.py:61-71)."""
        self.dataset = dataset
        self.cfg = cfg
        self.num_groups = num_groups
        self.group_offset = group_offset
        self.local_groups = (
            local_groups if local_groups is not None else num_groups
        )
        self.batch_pids = cfg.SOLVER.IMS_PER_BATCH
        self.num_instances = cfg.DATALOADER.NUM_INSTANCE
        self.use_resampling = cfg.DATALOADER.USE_RESAMPLING
        self.store = ImageStore(cfg.INPUT.SIZE_TRAIN, cfg.TPU.CACHE_IMAGES)
        self.prefetch = prefetch
        self._records: List[Record] = dataset.train

    def plan_for_epoch(self, epoch: int) -> EpochPlan:
        return build_epoch_plan(
            self.dataset.train_dict,
            self.batch_pids,
            self.num_instances,
            self.num_groups,
            epoch,
            self.use_resampling,
        )

    def steps_per_epoch(self, epoch: int = 0) -> int:
        return self.plan_for_epoch(epoch).num_steps

    def _assemble(self, plan: EpochPlan, t: int) -> dict:
        _, p, k = plan.sample_idx.shape[1:]
        g0, gl = self.group_offset, self.local_groups
        h, w = self.store.size_hw
        images = np.zeros((gl, p * k, h, w, 3), np.uint8)
        labels = np.zeros((gl, p * k), np.int32)
        camids = np.zeros((gl, p * k), np.int32)
        is_real = plan.is_real[t, g0:g0 + gl].reshape(gl, p * k).copy()
        for gi in range(gl):
            flat = 0
            for pi in range(p):
                for ki in range(k):
                    rec = self._records[plan.sample_idx[t, g0 + gi, pi, ki]]
                    labels[gi, flat] = rec.pid
                    camids[gi, flat] = rec.camid
                    if is_real[gi, flat]:
                        images[gi, flat] = self.store.get(rec.path)
                    flat += 1
        return {
            "images": images,
            "labels": labels,
            "camids": camids,
            "is_real": is_real,
        }

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Iterate one epoch with background prefetch."""
        plan = self.plan_for_epoch(epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for t in range(plan.num_steps):
                if stop.is_set():
                    return
                q.put(self._assemble(plan, t))
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class EvalLoader:
    """Sequential batches over query + gallery (datasets/bases.py:126-136).

    Yields (images [B,H,W,3] uint8, pids, camids, valid-mask); the final
    batch is zero-padded to the static batch size with valid=False tails.
    """

    def __init__(self, records: List[Record], cfg,
                 batch_size: Optional[int] = None, prefetch: int = 2,
                 store: Optional[ImageStore] = None):
        self.records = records
        self.batch_size = batch_size or cfg.TEST.IMS_PER_BATCH
        # pass a shared store so repeated validations reuse decoded images
        self.store = store or ImageStore(
            cfg.INPUT.SIZE_TEST, cfg.TPU.CACHE_IMAGES
        )
        self.n_threads = cfg.TPU.PREFETCH_THREADS
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.records) // self.batch_size)

    def _assemble(self, start: int) -> dict:
        b = self.batch_size
        chunk = self.records[start:start + b]
        images = np.zeros((b, *self.store.item_shape()), np.uint8)
        pids = np.zeros((b,), np.int64)
        camids = np.zeros((b,), np.int64)
        valid = np.zeros((b,), bool)
        self.store.get_many(
            [rec.path for rec in chunk], images[:len(chunk)],
            n_threads=self.n_threads,
        )
        for i, rec in enumerate(chunk):
            pids[i] = rec.pid
            camids[i] = rec.camid
            valid[i] = True
        return {
            "images": images, "pids": pids, "camids": camids, "valid": valid,
        }

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for start in range(0, len(self.records), self.batch_size):
                if stop.is_set():
                    return
                q.put(self._assemble(start))
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
