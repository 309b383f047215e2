"""Portable serving artifacts: the embed program serialized via
``jax.export`` (StableHLO) into a single self-contained file.

The reference has no deployment-export story at all — serving means
re-instantiating the LightningModule from source and loading a ``.ckpt``
(/root/reference/inference/create_embeddings.py:73-85). Production TPU
serving wants the opposite: a versioned artifact with the weights baked in
as constants, loadable and runnable on a host that has **neither the model
code nor the checkpoint** — only JAX. ``jax.export`` gives exactly that
(StableHLO + calling convention, with forward-compatibility guarantees),
so this module is TPU-native machinery with no reference counterpart.

Artifact contract
-----------------
One file::

    MAGIC (10 bytes) | meta_len (8-byte LE) | meta JSON | jax.export blob

The exported function is the full serving embed program — uint8 RGB
``[B, H, W, 3]`` in, device-side normalize (INPUT.PIXEL_MEAN/STD), backbone
+ BNNeck embed, optional L2-normalize — i.e. byte-identical semantics to
``RetrievalService``'s embed stage (service.py::embed_q, RGB branch). The
batch dimension is symbolic by default (any B), or fixed when
``batch_size`` is given (required for the int8 program, whose Pallas-free
XLA path still prefers one static shape in production).

The int8 PTQ program (models/quantized.py) can be exported the same way:
the quantized weight tree is baked into the artifact as constants — the
point of an artifact is self-containment, so the closure capture that
``RetrievalService`` deliberately avoids (service.py:181-185) is correct
here.

Loading: ``load_embedder(path)`` returns a callable wrapper that validates
the magic/version, re-hydrates the ``jax.export.Exported``, and handles
fixed-batch padding transparently. The only import it needs from this
package is this module.
"""

from __future__ import annotations

import json
import logging
import struct
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

MAGIC = b"CRTPU-ART\n"
FORMAT_VERSION = 1
# Serve on TPU, smoke-test/load on CPU. jax.export lowers for every
# platform in the tuple from one trace — no TPU needed at export time.
DEFAULT_PLATFORMS = ("tpu", "cpu")


# ---------------------------------------------------------------------
# export
# ---------------------------------------------------------------------

def export_embedder(
    model, cfg, params, batch_stats, *,
    normalize: bool = True,
    batch_size: Optional[int] = None,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    int8_qfn=None,
):
    """Serialize the serving embed program. Returns ``(blob, meta)``.

    ``batch_size=None`` exports a symbolic batch dimension (any B at call
    time — XLA still compiles once per distinct B on the serving host).
    ``int8_qfn``: a ``QuantizedEmbedFn`` (models/quantized.py) — exports
    the int8 program instead of the float one; requires ``batch_size``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..data.transforms import normalize_batch

    h, w = (int(v) for v in cfg.INPUT.SIZE_TEST)
    mean = tuple(float(v) for v in cfg.INPUT.PIXEL_MEAN)
    std = tuple(float(v) for v in cfg.INPUT.PIXEL_STD)
    emb_dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32

    if int8_qfn is not None:
        if batch_size is None:
            raise ValueError(
                "int8 export needs a fixed batch_size (the quantized "
                "program is deployed at one static serving shape)"
            )
        qtree = int8_qfn.qtree

        def embed(imgs_u8):
            e = int8_qfn.apply(qtree, imgs_u8)
            if normalize:
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
                )
            return e
    else:
        def embed(imgs_u8):
            x = normalize_batch(imgs_u8, mean, std, dtype=emb_dtype)
            e = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, method=model.embed,
            )
            if normalize:
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
                )
            return e

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(embed), platforms=tuple(platforms))(
        spec
    )
    out_aval = exported.out_avals[0]
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "embedder",
        "model_name": str(cfg.MODEL.NAME),
        "quantized": int8_qfn is not None,
        "input_size_hw": [h, w],
        "batch_size": batch_size,  # None => symbolic
        "emb_dim": int(out_aval.shape[-1]),
        "emb_dtype": str(np.dtype(out_aval.dtype)),
        "normalized": bool(normalize),
        "pixel_mean": list(mean),
        "pixel_std": list(std),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    return exported.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    meta_bytes = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)


def read_artifact(path: str):
    """Returns ``(blob, meta)`` after validating magic + format version."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            raise ValueError(
                f"{path}: not a centroids-reid-tpu artifact "
                f"(bad magic {head!r})"
            )
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        blob = f.read()
    ver = meta.get("format_version")
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"{path}: artifact format v{ver}, this loader reads "
            f"v{FORMAT_VERSION}"
        )
    return blob, meta


# ---------------------------------------------------------------------
# load
# ---------------------------------------------------------------------

class LoadedEmbedder:
    """A re-hydrated serving artifact: ``embed(uint8 [B,H,W,3]) -> [B,D]``.

    Fixed-batch artifacts transparently pad the final partial batch (the
    pad rows are dropped before returning). Symbolic-batch artifacts call
    straight through.
    """

    def __init__(self, exported, meta: dict):
        self.exported = exported
        self.meta = meta
        self._fixed = meta.get("batch_size")

    @property
    def input_size_hw(self):
        return tuple(self.meta["input_size_hw"])

    def embed(self, imgs_u8: np.ndarray) -> np.ndarray:
        imgs_u8 = np.ascontiguousarray(imgs_u8, dtype=np.uint8)
        h, w = self.input_size_hw
        if imgs_u8.ndim != 4 or imgs_u8.shape[1:] != (h, w, 3):
            raise ValueError(
                f"expected uint8 [B,{h},{w},3], got {imgs_u8.shape}"
            )
        n = imgs_u8.shape[0]
        if self._fixed is None:
            return np.asarray(self.exported.call(imgs_u8))
        bs = int(self._fixed)
        out = []
        for i in range(0, n, bs):
            chunk = imgs_u8[i: i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, h, w, 3), np.uint8)]
                )
            e = np.asarray(self.exported.call(chunk))
            out.append(e[: bs - pad] if pad else e)
        return np.concatenate(out) if out else np.zeros(
            (0, self.meta["emb_dim"]),
            np.dtype(self.meta["emb_dtype"]),
        )

    __call__ = embed


def load_embedder(path: str) -> LoadedEmbedder:
    from jax import export as jexport

    blob, meta = read_artifact(path)
    if meta.get("kind") != "embedder":
        raise ValueError(f"{path}: artifact kind {meta.get('kind')!r}, "
                         "expected 'embedder'")
    return LoadedEmbedder(jexport.deserialize(bytearray(blob)), meta)


# ---------------------------------------------------------------------
# CLI flow (inference/export_model.py shim)
# ---------------------------------------------------------------------

def export_from_config(cfg, output: str, *, batch_size: Optional[int] = None,
                       platforms: Sequence[str] = DEFAULT_PLATFORMS,
                       normalize: bool = True) -> dict:
    """Checkpoint -> artifact: loads MODEL.PRETRAIN_PATH (orbax dir or
    reference ``.ckpt``/``.pth`` via the converter), optionally quantizes
    (TPU.INT8_EVAL — requires a prebuilt TPU.INT8_CACHE_PATH artifact so
    the exported int8 program carries deployment-grade calibration from
    real data, e.g. a prior ``create_embeddings``/eval run), exports, and
    writes ``output``. Returns the meta dict."""
    import os

    from .api import load_inference_model

    cache = ""
    if cfg.TPU.INT8_EVAL:
        # precondition-check before the (slow) checkpoint load
        from ..models.quantized import QuantizedEmbed

        cache = cfg.TPU.INT8_CACHE_PATH
        cache = QuantizedEmbed.npz_path(cache) if cache else ""
        if not (cache and os.path.exists(cache)):
            raise ValueError(
                "int8 export needs a calibrated artifact: set "
                "TPU.INT8_CACHE_PATH to the .npz written by a previous "
                "serving/eval run (self-calibration at export time would "
                "bake in whatever ad-hoc data happened to be around)"
            )

    model, params, batch_stats = load_inference_model(cfg)
    qfn = None
    if cfg.TPU.INT8_EVAL:
        from ..models.quantized import QuantizedEmbed, serving_identity

        qfn = QuantizedEmbed.load(cache)
        identity = serving_identity(cfg, model)
        if qfn.extra_meta != identity:
            # unlike the serving flow (which recalibrates), export must
            # refuse: there is no data here to recalibrate on, and a
            # stale program frozen into an artifact outlives every cache
            raise ValueError(
                f"int8 cache {cache} was calibrated for {qfn.extra_meta}, "
                f"current config is {identity} — rebuild the cache before "
                "exporting"
            )
        if batch_size is None:
            batch_size = int(cfg.TEST.IMS_PER_BATCH)
    blob, meta = export_embedder(
        model, cfg, params, batch_stats, normalize=normalize,
        batch_size=batch_size, platforms=platforms, int8_qfn=qfn,
    )
    save_artifact(output, blob, meta)
    log.info("wrote %s (%d bytes, platforms=%s, batch=%s)", output,
             len(blob), meta["platforms"], meta["batch_size"] or "symbolic")
    return meta
