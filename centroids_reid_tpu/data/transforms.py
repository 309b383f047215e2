"""Image transforms — host decode/resize, device-side augmentation.

The reference augments on CPU workers via torchvision
(/root/reference/datasets/transforms/build.py:15-33): train =
Resize -> RandomHorizontalFlip(0.5) -> Pad(10) -> RandomCrop -> ToTensor ->
Normalize(ImageNet) -> RandomErasing(p=0.5, area 0.02-0.4, aspect 0.3-3.33,
fill = pixel mean, applied in *normalised* space,
transforms/random_erasing.py:23-55); eval = Resize -> ToTensor -> Normalize.

On TPU hosts CPU is scarce, so only JPEG decode + resize stay on the host;
flip / pad+crop / normalise / erase run on-device as one jitted, vmapped
uint8->float program — bandwidth-bound VPU work that overlaps with the
previous step's compute.

Divergence (documented): RandomErasing retries up to 100 times until the
sampled rectangle fits (random_erasing.py:35-44); we draw a fixed number of
candidate rectangles per image and use the first valid one (static shapes
under jit). With the canonical 256x128 input the acceptance probability per
draw is ~0.8, so >=8 draws make the no-erase-when-accepted probability
negligible.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

_N_ERASE_DRAWS = 8


def decode_and_resize_bytes(
    data: bytes, size_hw: Tuple[int, int]
) -> np.ndarray:
    """Host: decode encoded image bytes to RGB and resize to (H, W).
    Returns uint8 [H, W, 3].

    PIL's BILINEAR matches torchvision T.Resize default interpolation.
    JPEGs take the native C++ path when available (bit-exact vs PIL —
    same libjpeg defaults, same fixed-point resample; see
    centroids_reid_tpu/native and tests/test_native.py) and fall back to
    PIL for anything the native decoder declines (PNG, CMYK, corrupt).
    """
    from ..native import decode_resize

    out = decode_resize(data, size_hw)
    if out is not None:
        return out
    import io

    img = Image.open(io.BytesIO(data)).convert("RGB")
    h, w = size_hw
    img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def load_and_resize(path: str, size_hw: Tuple[int, int]) -> np.ndarray:
    """File variant of decode_and_resize_bytes (the offline/eval loaders)."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_and_resize_bytes(data, size_hw)


def decode_and_pack_yuv420_bytes(
    data: bytes, size_hw: Tuple[int, int]
) -> np.ndarray:
    """Host serving-path ingest: decode (DCT-scaled for large sources),
    resize, pack planar YUV420. Returns uint8 [1.5*H*W]. Falls back to
    exact PIL decode + numpy pack for anything the native decoder
    declines; the pack itself is lossy either way (4:2:0 chroma), which
    is why this path is gated behind TPU.FAST_DECODE."""
    from ..native import decode_fast, rgb_to_yuv420_np

    out = decode_fast(data, size_hw)
    if out is not None:
        return out
    import io

    img = Image.open(io.BytesIO(data)).convert("RGB")
    h, w = size_hw
    img = img.resize((w, h), Image.BILINEAR)
    return rgb_to_yuv420_np(np.asarray(img, np.uint8))


def load_and_pack_yuv420(path: str, size_hw: Tuple[int, int]) -> np.ndarray:
    """File variant of decode_and_pack_yuv420_bytes (offline fast ingest)."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_and_pack_yuv420_bytes(data, size_hw)


def ingest_item_shape(fmt: str, size_hw: Tuple[int, int]) -> Tuple[int, ...]:
    """Per-image uint8 shape a serving wire format produces: packed planar
    YUV420 ``[1.5*H*W]`` or RGB ``[H, W, 3]``. The single source of truth
    for the shape that the service, artifact export/load, server warmup,
    and data loader all need to agree on."""
    h, w = (int(v) for v in size_hw)
    if fmt == "yuv420":
        return (h * w * 3 // 2,)
    return (h, w, 3)


def ingest_blobs(fmt: str, size_hw: Tuple[int, int], blobs) -> np.ndarray:
    """Encoded image bytes -> the uint8 batch the serving query program
    consumes, per wire format (shape ``[B, *ingest_item_shape(...)]``).
    Pure host work (no device dispatch) — callers may run it concurrently
    across threads; the shared decode path of RetrievalService and
    LoadedRetriever."""
    size = tuple(int(v) for v in size_hw)
    if fmt == "yuv420":
        return np.stack(
            [decode_and_pack_yuv420_bytes(b, size) for b in blobs]
        )
    return np.stack([decode_and_resize_bytes(b, size) for b in blobs])


def _normalize(x_f32, mean, std):
    return (x_f32 / 255.0 - mean) / std


def _augment_one(img_u8, rng, size_hw, padding, mean, std, flip_p, re_p):
    """uint8 [H,W,3] -> float32 normalized augmented [H,W,3]."""
    h, w = size_hw
    k_flip, k_crop, k_erase = jax.random.split(rng, 3)

    x = img_u8.astype(jnp.float32)

    # horizontal flip
    do_flip = jax.random.uniform(k_flip) < flip_p
    x = jnp.where(do_flip, x[:, ::-1, :], x)

    # pad(value 0 = black, pre-normalisation) + random crop back to (h, w)
    x = jnp.pad(x, ((padding, padding), (padding, padding), (0, 0)))
    off = jax.random.randint(k_crop, (2,), 0, 2 * padding + 1)
    x = jax.lax.dynamic_slice(x, (off[0], off[1], 0), (h, w, 3))

    x = _normalize(x, mean, std)

    # random erasing in normalised space, fill = PIXEL_MEAN values
    ks = jax.random.split(k_erase, 4)
    do_erase = jax.random.uniform(ks[0]) < re_p
    area = h * w
    target_area = jax.random.uniform(
        ks[1], (_N_ERASE_DRAWS,), minval=0.02, maxval=0.4
    ) * area
    aspect = jax.random.uniform(
        ks[2], (_N_ERASE_DRAWS,), minval=0.3, maxval=1.0 / 0.3
    )
    eh = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    ew = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (eh < h) & (ew < w)
    first = jnp.argmax(valid)  # first valid draw (0 if none)
    any_valid = jnp.any(valid)
    eh0 = jnp.minimum(eh[first], h - 1)
    ew0 = jnp.minimum(ew[first], w - 1)
    # NOTE: position keys come from a fresh split (ks[3]), never from the
    # already-consumed decision key ks[0] — reusing a consumed key would
    # correlate the erase decision with the rectangle placement (fixed in
    # round 2; this changes the augmentation stream vs round 1).
    ky, kx = jax.random.split(ks[3])
    # uniform over valid top-left corners (dynamic upper bound)
    y0 = (jax.random.uniform(ky) * (h - eh0 + 1).astype(jnp.float32)).astype(jnp.int32)
    x0 = (jax.random.uniform(kx) * (w - ew0 + 1).astype(jnp.float32)).astype(jnp.int32)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    in_rect = (rows >= y0) & (rows < y0 + eh0) & (cols >= x0) & (cols < x0 + ew0)
    erase_mask = in_rect & do_erase & any_valid
    x = jnp.where(erase_mask[..., None], mean, x)
    return x


@partial(jax.jit, static_argnames=("size_hw", "padding", "flip_p", "re_p", "dtype"))
def augment_batch(
    imgs_u8,
    is_real,
    rng,
    size_hw: Tuple[int, int],
    padding: int,
    mean,
    std,
    flip_p: float,
    re_p: float,
    dtype=jnp.float32,
):
    """[..., H, W, 3] uint8 -> normalised augmented images, mocks zeroed.

    Mock slots become exactly zero *after* normalisation, matching the
    reference's torch.zeros_like(transformed_img) mocks
    (datasets/bases.py:398-400).
    """
    lead = imgs_u8.shape[:-3]
    flat = imgs_u8.reshape((-1,) + imgs_u8.shape[-3:])
    rngs = jax.random.split(rng, flat.shape[0])
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    out = jax.vmap(
        lambda im, r: _augment_one(
            im, r, size_hw, padding, mean_a, std_a, flip_p, re_p
        )
    )(flat, rngs)
    out = out.reshape(lead + out.shape[-3:])
    out = jnp.where(is_real[..., None, None, None], out, 0.0)
    return out.astype(dtype)


@partial(jax.jit, static_argnames=("dtype",))
def normalize_batch(imgs_u8, mean, std, dtype=jnp.float32):
    """Eval path: uint8 -> normalised float (Resize happened on host)."""
    x = _normalize(
        imgs_u8.astype(jnp.float32),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(std, jnp.float32),
    )
    return x.astype(dtype)


# ---------------------------------------------------------------------
# Serving fast-ingest unpack (TPU.FAST_DECODE): invert the native
# planar-YUV420 wire format (native/decode.cpp::rgb_to_yuv420) on device.
# Pure VPU elementwise/reshape work that XLA fuses into the embed
# program's first conv prologue — the win is 2x fewer bytes over the
# host->device link, the dominant cost of the offline-embedding surface.
# ---------------------------------------------------------------------

def _chroma_up2(c, axis):
    """Triangle 2x upsample along ``axis`` (libjpeg 'fancy upsampling'
    weights 3/4, 1/4 with edge replication): half-res chroma -> full."""
    c = jnp.moveaxis(c, axis, -1)
    cl = jnp.concatenate([c[..., :1], c[..., :-1]], axis=-1)
    cr = jnp.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
    pair = jnp.stack([0.75 * c + 0.25 * cl, 0.75 * c + 0.25 * cr], axis=-1)
    out = pair.reshape(*c.shape[:-1], c.shape[-1] * 2)
    return jnp.moveaxis(out, -1, axis)


def yuv420_to_rgb(packed_u8, size_hw):
    """Packed YUV420 uint8 [..., 1.5*H*W] -> RGB float32 [..., H, W, 3]
    in [0, 255]. Full-range BT.601 inverse (the JPEG convention), matching
    the forward constants in native/decode.cpp::rgb_to_yuv420."""
    h, w = size_hw
    hw, c2 = h * w, (h // 2) * (w // 2)
    lead = packed_u8.shape[:-1]
    y = packed_u8[..., :hw].reshape(*lead, h, w).astype(jnp.float32)
    u = packed_u8[..., hw:hw + c2].reshape(*lead, h // 2, w // 2)
    v = packed_u8[..., hw + c2:].reshape(*lead, h // 2, w // 2)
    u = _chroma_up2(_chroma_up2(u.astype(jnp.float32), -1), -2) - 128.0
    v = _chroma_up2(_chroma_up2(v.astype(jnp.float32), -1), -2) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@partial(jax.jit, static_argnames=("size_hw", "dtype"))
def normalize_yuv420_batch(packed_u8, size_hw, mean, std,
                           dtype=jnp.float32):
    """Fast-ingest eval path: packed YUV420 -> normalised float images."""
    x = _normalize(
        yuv420_to_rgb(packed_u8, size_hw),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(std, jnp.float32),
    )
    return x.astype(dtype)
