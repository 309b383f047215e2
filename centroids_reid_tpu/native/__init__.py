"""Native (C++) ingest path: JPEG decode + Pillow-bit-exact resize.

The shared library is built from ``decode.cpp`` on first use with the
system toolchain (g++ + libjpeg, both baked into TPU host images) and
cached next to the Python build tag. Every entry point degrades to the
PIL path transparently:

* toolchain or libjpeg missing -> ``available()`` is False, callers use PIL;
* an individual image the native decoder refuses (CMYK, corrupt, ...)
  -> per-image fallback to PIL.

Bit-exactness vs PIL (decode: same libjpeg-turbo defaults; resize: a port
of Pillow's fixed-point triangle-filter resample) is asserted by
tests/test_native.py, so the two paths are interchangeable mid-dataset.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sys
import tempfile
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "decode.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_dir() -> str:
    """Per-user, mode-0700 build cache. The .so path is predictable, so a
    shared world-writable directory would let another local user plant a
    library that ctypes would happily load — refuse any cache dir we do
    not exclusively own."""
    d = os.environ.get("CRT_NATIVE_CACHE") or os.path.join(
        tempfile.gettempdir(), f"crt_native_{os.getuid()}"
    )
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.geteuid() or (st.st_mode & 0o022):
        raise RuntimeError(
            f"native build cache {d} is not exclusively owned by this user"
        )
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("CRT_NO_NATIVE"):
            _build_failed = True
            return None
        try:
            with open(_SRC, "rb") as f:
                tag = hashlib.sha256(
                    f.read() + sys.version.encode()
                ).hexdigest()[:16]
            so = os.path.join(_build_dir(), f"crt_decode_{tag}.so")
            if not os.path.exists(so):
                tmp = so + f".build{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", tmp, "-ljpeg", "-pthread"],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)  # atomic vs concurrent builders
            lib = ctypes.CDLL(so)
            lib.crt_decode_resize.restype = ctypes.c_int
            lib.crt_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.crt_decode_resize_batch.restype = None
            lib.crt_decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            assert lib.crt_abi_version() == 1
            _self_check(lib)
            _lib = lib
        except Exception as e:  # noqa: BLE001 — any failure means "use PIL"
            log.info(f"native decode unavailable ({e}); using PIL")
            _build_failed = True
    return _lib


def _self_check(lib) -> None:
    """Bit-exactness gate at load time: decode+resize one synthetic JPEG
    through the freshly-loaded library and through PIL. Pillow bundles
    libjpeg-turbo while ``-ljpeg`` links the system library — if the host
    has a different libjpeg (e.g. IJG v9, different IDCT arithmetic), the
    'interchangeable mid-dataset' invariant would silently break; instead
    the native path disables itself here."""
    import io

    from PIL import Image

    rng = np.random.RandomState(1234)
    arr = rng.randint(0, 256, (24, 17, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=85)
    data = buf.getvalue()
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (20, 40), Image.BILINEAR
        ),
        np.uint8,
    )
    got = np.empty((40, 20, 3), np.uint8)
    rc = lib.crt_decode_resize(
        data, len(data), 40, 20,
        got.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0 or not np.array_equal(got, ref):
        raise RuntimeError(
            "system libjpeg does not reproduce PIL's decode bytes"
        )


def available() -> bool:
    return _load() is not None


def decode_resize(data: bytes, size_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 [H, W, 3], or None (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    h, w = size_hw
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.crt_decode_resize(
        data, len(data), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def decode_resize_batch(
    blobs: Sequence[bytes], size_hw: Tuple[int, int],
    out: Optional[np.ndarray] = None, n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, List[int]]]:
    """Decode+resize a batch; returns (out [N,H,W,3], failed_indices) or
    None when the native library is unavailable. ``failed_indices`` lists
    images the caller must decode via PIL."""
    lib = _load()
    if lib is None:
        return None
    h, w = size_hw
    n = len(blobs)
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    # hard checks, not asserts: the C side writes through the raw base
    # pointer assuming a dense [N,H,W,3] uint8 buffer, so a wrong shape /
    # dtype / non-contiguous view would be silent memory corruption
    if (
        out.shape != (n, h, w, 3)
        or out.dtype != np.uint8
        or not out.flags.c_contiguous
    ):
        raise ValueError(
            f"out must be C-contiguous uint8 [{n},{h},{w},3]; got "
            f"{out.shape} {out.dtype} contiguous={out.flags.c_contiguous}"
        )
    datas = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    rcs = (ctypes.c_int * n)()
    if n_threads <= 0:
        n_threads = min(32, os.cpu_count() or 1)
    lib.crt_decode_resize_batch(
        datas, lens, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), rcs, n_threads,
    )
    failed = [i for i in range(n) if rcs[i] != 0]
    return out, failed
