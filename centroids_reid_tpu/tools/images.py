"""Host-side image utilities for the prep tooling."""

from __future__ import annotations

import concurrent.futures
import logging
import os
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True
log = logging.getLogger(__name__)


def letterbox_resize(im: Image.Image, target_wh: Tuple[int, int]) -> Image.Image:
    """Aspect-preserving thumbnail centred on a white canvas
    (reference _resize_thumbnail, data_utils.py:180-191)."""
    im = im.copy()
    im.thumbnail(target_wh, Image.LANCZOS)
    canvas = Image.new("RGB", target_wh, (255, 255, 255))
    canvas.paste(
        im,
        (
            (target_wh[0] - im.size[0]) // 2,
            (target_wh[1] - im.size[1]) // 2,
        ),
    )
    return canvas


def crop_bbox_xywh(
    image: Image.Image, bbox_xywh: Sequence, target_wh: Tuple[int, int]
) -> Image.Image:
    """Crop a COCO [x, y, w, h] box and letterbox to target size
    (reference crop_single_bbox, data_utils.py:194-205)."""
    x1, y1, w, h = [int(v) for v in bbox_xywh[:4]]
    arr = np.asarray(image)
    cut = arr[y1:y1 + h, x1:x1 + w]
    return letterbox_resize(Image.fromarray(cut), target_wh)


def crop_bbox_corners(
    image: Image.Image, bbox_xyxy: Sequence, target_wh: Tuple[int, int]
) -> Image.Image:
    """Crop an [x1, y1, x2, y2] box and letterbox to target size.

    NOTE (conscious fix, documented): the reference feeds scaled *corner*
    boxes from list_bbox_consumer2shop.txt into its [x, y, w, h] cropper
    (deep_fashion2reid.py:179-187 -> data_utils.py:198-200), which silently
    crops to the image edge instead of the annotated box. We crop the
    annotated rectangle correctly.
    """
    x1, y1, x2, y2 = [int(v) for v in bbox_xyxy[:4]]
    arr = np.asarray(image)
    cut = arr[y1:y2, x1:x2]
    return letterbox_resize(Image.fromarray(cut), target_wh)


def get_image_size(path) -> Tuple[int, int]:
    try:
        return Image.open(path).size
    except Exception:
        return (1, 1)


def convert_dir_to_jpg(source_dir, target_dir, num_threads: int = 4):
    """Threaded RGB-JPEG conversion of a folder
    (reference scripts/convert_to_jpg.py). Returns (success, failed)."""
    source_dir = Path(source_dir)
    target_dir = Path(target_dir)
    os.makedirs(target_dir, exist_ok=True)
    sources = [source_dir / f for f in os.listdir(source_dir)]
    log.info(f"Processing {len(sources)} images from {source_dir}")

    counters = {"success": 0, "failed": 0}

    def convert(src):
        try:
            im = Image.open(src).convert("RGB")
            im.save(target_dir / Path(src).with_suffix(".jpg").name)
            counters["success"] += 1
        except Exception as e:  # noqa: BLE001 — count and continue
            log.error(e)
            counters["failed"] += 1

    with concurrent.futures.ThreadPoolExecutor(num_threads) as pool:
        list(pool.map(convert, sources))
    return counters["success"], counters["failed"]
