"""DeepFashion Consumer-to-Shop -> ReID-ready COCO jsons + cropped images.

Behavioural parity with /root/reference/scripts/deep_fashion2reid.py:
* parses ``Eval/list_eval_partition.txt`` (train/val/test product splits)
  and ``Anno/list_bbox_consumer2shop.txt`` (corner bboxes in *low-res*
  coordinates, style 1-3, source 1=shop / 2=user);
* scales low-res corner boxes to the high-res images by aspect ratio
  (:27-41), crops and letterboxes to the target size;
* one global pair_id per product directory (:75-85);
* emits ``{train,val,test}_reid_cropped_W_H.json`` and derives the re-id
  protocol splits: query = test user photos, gallery = test shop photos +
  val shop photos, pair ids relabelled over their union (:228-318);
* cropped images end up under ``W_H_cropped_images/{train,query,gallery}``.

Conscious fix (documented in images.crop_bbox_corners): the reference
mis-feeds corner boxes into an [x,y,w,h] cropper; we crop the annotated
rectangle.
"""

from __future__ import annotations

import logging
import os
import shutil
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple

from PIL import Image

from .coco import image_info, reid_annotation, save_json
from .images import crop_bbox_corners, letterbox_resize

log = logging.getLogger(__name__)

SOURCES = {"1": "shop", "2": "user"}


def parse_eval_partition(lines: List[str]) -> Dict[str, List[Dict]]:
    """subset -> [{'pair_id', 'source_dir'}] (skips 2 header lines)."""
    split = defaultdict(list)
    for line in lines[2:]:
        tokens = line.split()
        if not tokens:
            continue
        split[tokens[-1]].append(
            {"pair_id": tokens[-2], "source_dir": os.path.split(tokens[0])[0]}
        )
    return dict(split)


def parse_bboxes(lines: List[str]) -> Dict[str, Dict[str, Dict]]:
    """product-dir -> {photo: {'bbox' [x1,y1,x2,y2] low-res, 'style', 'source'}}."""
    out: Dict[str, Dict[str, Dict]] = defaultdict(dict)
    for line in lines[2:]:
        tokens = line.split()
        if not tokens:
            continue
        parts = tokens[0].split("/")
        out[parts[-2]][parts[-1]] = {
            "bbox": [int(v) for v in tokens[-4:]],
            "style": tokens[1],
            "source": SOURCES[tokens[2]],
        }
    return dict(out)


def global_pair_id_map(split: Dict[str, List[Dict]]) -> Dict[str, int]:
    """Product directory name -> global pair id, in first-seen order over
    subsets then sorted-unique source dirs (reference :75-85)."""
    import numpy as np

    mapping: Dict[str, int] = {}
    next_id = 0
    for subset in split.values():
        for source in np.unique([i["source_dir"] for i in subset]):
            name = source.split("/")[-1]
            if name not in mapping:
                mapping[name] = next_id
                next_id += 1
    return mapping


def scale_corners_to_high_res(bbox, low_wh, high_wh) -> List[int]:
    lw, lh = low_wh
    w, h = high_wh
    x1, y1, x2, y2 = bbox
    return [int(x1 / lw * w), int(y1 / lh * h), int(x2 / lw * w), int(y2 / lh * h)]


def _iter_subset_files(root: Path, split_entries: List[Dict]):
    """Yield (dir_name, file, high_res_path, low_res_path)."""
    import numpy as np

    for source in np.unique([i["source_dir"] for i in split_entries]):
        rel = source[4:] if source.startswith("img/") else source
        high_dir = root / "img_highres" / rel
        low_dir = root / "img_low_res" / rel
        if not high_dir.is_dir():
            log.warning(f"missing high-res dir {high_dir}; skipped")
            continue
        dir_name = Path(source).name
        for f in sorted(os.listdir(high_dir)):
            yield dir_name, f, high_dir / f, low_dir / f


def build_subset(
    root: Path,
    subset_name: str,
    split_entries: List[Dict],
    pair_map: Dict[str, int],
    bboxes: Dict[str, Dict[str, Dict]],
    crop_root: Path,
    target_wh: Tuple[int, int],
    next_ids: Dict[str, int],
) -> Tuple[List[Dict], List[Dict]]:
    """Crop one subset; returns (images_info, annotations)."""
    save_dir = crop_root / subset_name
    save_dir.mkdir(exist_ok=True, parents=True)
    images, annos = [], []

    for dir_name, fname, high_path, low_path in _iter_subset_files(
        root, split_entries
    ):
        anno = bboxes.get(dir_name, {}).get(fname)
        if anno is None:
            continue
        new_name = f"{dir_name}_{fname}"
        img = Image.open(high_path)
        w, h = img.size

        if anno["bbox"]:
            try:
                low_wh = Image.open(low_path).size
            except FileNotFoundError:
                low_wh = (w, h)  # bbox already in high-res coords
            hi_bbox = scale_corners_to_high_res(anno["bbox"], low_wh, (w, h))
            if hi_bbox[2] - hi_bbox[0] <= 0 or hi_bbox[3] - hi_bbox[1] <= 0:
                continue
            cropped = crop_bbox_corners(img, hi_bbox, target_wh)
        else:
            cropped = letterbox_resize(img, target_wh)

        im_id = next_ids["image"]
        next_ids["image"] += 1
        images.append(image_info(im_id, w, h, new_name))
        annos.append(
            reid_annotation(
                anno_id=next_ids["anno"],
                image_id=im_id,
                category_id=anno["style"],
                pair_id=pair_map[dir_name],
                style=anno["style"],
                source=anno["source"],
            )
        )
        next_ids["anno"] += 1
        if not (save_dir / new_name).is_file():
            cropped.save(save_dir / new_name)
    return images, annos


def query_gallery_split(
    all_images: Dict[str, List[Dict]], all_annos: Dict[str, List[Dict]]
) -> Tuple[Dict, Dict]:
    """query = test user photos; gallery = test shop + val shop photos;
    pair ids relabelled over the union (reference :228-318)."""
    test_images = {i["id"]: i for i in all_images["test"]}
    q_annos = [a for a in all_annos["test"] if a["source"] == "user"]
    g_annos = [a for a in all_annos["test"] if a["source"] != "user"]
    q_img_ids = {a["image_id"] for a in q_annos}
    q_images = [test_images[i] for i in test_images if i in q_img_ids]
    g_images = [test_images[i] for i in test_images if i not in q_img_ids]

    val_images = {i["id"]: i for i in all_images["val"]}
    gv_annos = [a for a in all_annos["val"] if a["source"] == "shop"]
    gv_img_ids = {a["image_id"] for a in gv_annos}
    g_annos = g_annos + gv_annos
    g_images = g_images + [val_images[i] for i in val_images if i in gv_img_ids]

    pair_ids = sorted(
        {a["pair_id"] for a in q_annos} | {a["pair_id"] for a in g_annos}
    )
    relabel = {p: i for i, p in enumerate(pair_ids)}
    for a in q_annos + g_annos:
        a["pair_id"] = relabel[a["pair_id"]]

    return (
        {"images": q_images, "annotations": q_annos},
        {"images": g_images, "annotations": g_annos},
    )


def deep_fashion_to_reid(root_dir: str, target_image_size=(320, 320)):
    root = Path(root_dir)
    target_wh = tuple(target_image_size)
    crop_root = root / f"{target_wh[0]}_{target_wh[1]}_cropped_images"
    crop_root.mkdir(exist_ok=True)

    # the distributed archive misnames one directory (reference :359-366)
    bad = root / "img_highres/CLOTHING/Summer_Suit"
    if bad.is_dir():
        log.warning(f"Renaming {bad} -> Summer_Wear")
        shutil.move(str(bad), str(root / "img_highres/CLOTHING/Summer_Wear"))

    with open(root / "Eval/list_eval_partition.txt") as f:
        split = parse_eval_partition(f.readlines())
    with open(root / "Anno/list_bbox_consumer2shop.txt") as f:
        bboxes = parse_bboxes(f.readlines())
    pair_map = global_pair_id_map(split)

    log.info(f"Cropping and resizing images to {target_wh}...")
    next_ids = {"image": 0, "anno": 0}
    all_images, all_annos = {}, {}
    for subset_name, entries in split.items():
        images, annos = build_subset(
            root, subset_name, entries, pair_map, bboxes, crop_root,
            target_wh, next_ids,
        )
        all_images[subset_name] = images
        all_annos[subset_name] = annos
        save_json(
            {"images": images, "annotations": annos},
            root / f"{subset_name}_reid_cropped_{target_wh[0]}_{target_wh[1]}.json",
        )

    log.info("Creating query and gallery splits...")
    query, gallery = query_gallery_split(all_images, all_annos)
    save_json(
        query, root / f"query_reid_cropped_{target_wh[0]}_{target_wh[1]}.json"
    )
    save_json(
        gallery, root / f"gallery_reid_cropped_{target_wh[0]}_{target_wh[1]}.json"
    )

    log.info("Scattering query/gallery images...")
    for mode, data in (("query", query), ("gallery", gallery)):
        (crop_root / mode).mkdir(exist_ok=True, parents=True)
        for info in data["images"]:
            for subset in ("test", "val"):
                src = crop_root / subset / info["file_name"]
                if src.is_file():
                    shutil.copy(src, crop_root / mode / info["file_name"])
    return all_images, all_annos
