"""Street2Shop -> COCO -> ReID-ready jsons + cropped images.

Behavioural parity with /root/reference/scripts/street2shop2coco.py and
street2shop_coco2reid.py:

Stage 1 (``street2shop_to_coco``): raw Exact-Street2Shop metadata (per
category ``{train,test}_pairs_*.json`` + ``retrieval_*.json``) becomes one
COCO json of all referenced street photos (filenames are the photo ids
zero-filled to 9 digits), plus the txt inventories the reference emits.

Stage 2 (``street2shop_coco_to_reid``):
* one global pair_id per (category, product), sequential from 1 over
  sorted unique products of train+test+retrieval (coco2reid.py:34-62);
* per category x {train, test}: street photos (source 'user') plus
  retrieval shop photos (source 'shop') — train keeps shop photos of train
  products, test keeps shop photos of products NOT in train (:179-231);
* test splits into query (user photos) / gallery (shop photos) (:261-299);
* bbox crops (letterboxed, minimum-area filter), fresh pair ids keyed by
  (old pair id, style), new filenames ``stem_{style}_{idx}.jpg`` (:302-422);
* per-set category merge into ``{train,query,gallery}_coco_reid.json`` and
  image scattering into ``images_reid_cropped_W_H/{set}`` (:425-629).
"""

from __future__ import annotations

import logging
import os
import shutil
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

from .coco import (
    S2S_CATEGORIES,
    bbox_s2s_to_coco,
    category_entry,
    dataset_header,
    image_info,
    load_json,
    plain_annotation,
    reid_annotation,
    save_json,
)
from .images import crop_bbox_xywh, get_image_size, letterbox_resize

log = logging.getLogger(__name__)

SET_NAMES = ("train", "query", "gallery")


def _photo_filename(photo_id) -> str:
    return str(photo_id).zfill(9) + ".jpg"


# ---------------------------------------------------------------------------
# Stage 1: raw metadata -> COCO json of street photos
# ---------------------------------------------------------------------------


def street2shop_to_coco(root_dir, metadata_dir, images_dir, save_dir):
    root = Path(root_dir)
    meta = root / metadata_dir / "json"
    images = root / images_dir
    out = root / save_dir
    out.mkdir(exist_ok=True, parents=True)

    cat2id = {name: i for i, name in enumerate(S2S_CATEGORIES)}

    # txt inventories (reference street2shop2coco.py:72-102)
    names: Dict[str, List[str]] = {"train": [], "test": []}
    for mode in ("train", "test"):
        for cat in S2S_CATEGORIES:
            path = meta / f"{mode}_pairs_{cat}.json"
            if not path.exists():
                continue
            names[mode].extend(
                _photo_filename(i["photo"]) for i in load_json(path)
            )
        with open(out / f"{mode}_data.txt", "w") as f:
            f.write("".join(n + "\n" for n in names[mode]))
    all_names = names["train"] + names["test"]
    with open(out / "train_all.txt", "w") as f:
        f.write("".join(n + "\n" for n in all_names))
    for cat in S2S_CATEGORIES:
        path = meta / f"retrieval_{cat}.json"
        if not path.exists():
            continue
        products = sorted({i["photo"] for i in load_json(path)})
        with open(out / f"{cat}_products.txt", "w") as f:
            f.write("".join(_photo_filename(p) + "\n" for p in products))

    # COCO json (reference coco_format_utils.py)
    header = dataset_header()
    imgs = []
    for name in all_names:
        w, h = get_image_size(images / name)
        imgs.append(image_info(int(name.split(".")[0].lstrip("0") or 0),
                               w, h, name))
    annos, cats = [], []
    anno_id = 0
    for mode in ("train", "test"):
        for cat in S2S_CATEGORIES:
            path = meta / f"{mode}_pairs_{cat}.json"
            if not path.exists():
                continue
            if len(cats) < len(S2S_CATEGORIES):
                cats.append(category_entry(cat2id[cat], cat))
            for item in load_json(path):
                annos.append(
                    plain_annotation(
                        anno_id, item["photo"], cat2id[cat],
                        bbox=bbox_s2s_to_coco(item["bbox"]),
                    )
                )
                anno_id += 1

    coco = {
        "info": header["info"],
        "images": imgs,
        "annotations": annos,
        "categories": cats,
        "licenses": header["licenses"],
    }
    save_json(coco, out / "all_street_train.json")
    log.info("Street2Shop_to_coco processing finished")
    return coco


# ---------------------------------------------------------------------------
# Stage 2: COCO -> ReID splits + crops
# ---------------------------------------------------------------------------


def build_pair_id_map(meta: Path) -> Dict[str, Dict[int, int]]:
    mapping: Dict[str, Dict[int, int]] = {}
    next_id = 1
    for cat in S2S_CATEGORIES:
        items = []
        for stem in (f"retrieval_{cat}", f"train_pairs_{cat}",
                     f"test_pairs_{cat}"):
            path = meta / f"{stem}.json"
            if path.exists():
                items.extend(load_json(path))
        cat_map: Dict[int, int] = {}
        for product in sorted({i["product"] for i in items}):
            cat_map[product] = next_id
            next_id += 1
        mapping[cat] = cat_map
    return mapping


def _coco_bbox_and_area(item) -> Tuple:
    bb = item.get("bbox")
    if bb is None:
        return "", 0
    return (
        [int(v) for v in bbox_s2s_to_coco(bb)],
        int(np.ceil(bb["width"] * bb["height"])),
    )


def build_category_set(
    meta: Path, cat: str, cat_id: int, mode: str,
    pair_map: Dict[int, int], train_products: set,
) -> Dict:
    """One category x mode json: street (user) + retrieval (shop) annos."""
    street = load_json(meta / f"{mode}_pairs_{cat}.json")
    retrieval = load_json(meta / f"retrieval_{cat}.json")

    annos, image_ids = [], []
    anno_id = 0
    products = set()
    for item in street:
        bbox, area = _coco_bbox_and_area(item)
        pid = pair_map[item["product"]]
        products.add(pid)
        image_ids.append(item["photo"])
        annos.append(
            reid_annotation(anno_id, item["photo"], cat_id, bbox=bbox,
                            pair_id=pid, style=cat_id, source="user",
                            area=area)
        )
        anno_id += 1

    keep = products if mode == "train" else train_products
    invert = mode == "test"
    for item in retrieval:
        pid = pair_map[item["product"]]
        if (pid in keep) == invert:
            continue
        bbox, area = _coco_bbox_and_area(item)
        image_ids.append(item["photo"])
        annos.append(
            reid_annotation(anno_id, item["photo"], cat_id, bbox=bbox,
                            pair_id=pid, style=cat_id, source="shop",
                            area=area)
        )
        anno_id += 1

    return {"annotations": annos, "image_ids": sorted(set(image_ids)),
            "train_products": products}


def street2shop_coco_to_reid(
    root_dir, metadata_dir, images_dir, save_dir,
    target_image_size=(320, 320), minimum_bbox_area: int = 1,
):
    root = Path(root_dir)
    meta = root / metadata_dir / "json"
    images_dir = root / images_dir
    out = root / save_dir
    out.mkdir(exist_ok=True, parents=True)
    target_wh = tuple(target_image_size)
    cat2id = {name: i for i, name in enumerate(S2S_CATEGORIES)}

    log.info("Creating global product to pair-id mapping...")
    pair_map = build_pair_id_map(meta)

    # per-category splits
    per_cat: Dict[str, Dict] = {}
    for cat in S2S_CATEGORIES:
        if not (meta / f"train_pairs_{cat}.json").exists():
            continue
        train_set = build_category_set(
            meta, cat, cat2id[cat], "train", pair_map[cat], set()
        )
        test_set = build_category_set(
            meta, cat, cat2id[cat], "test", pair_map[cat],
            train_set["train_products"],
        )
        query = [a for a in test_set["annotations"] if a["source"] == "user"]
        gallery = [a for a in test_set["annotations"] if a["source"] != "user"]
        per_cat[cat] = {
            "train": train_set["annotations"],
            "query": query,
            "gallery": gallery,
        }

    # crop + renumber (reference :302-422)
    log.info(f"Cropping and resizing images to {target_wh}...")
    crop_tmp = root / f"images_cropped_{target_wh[0]}_{target_wh[1]}"
    pair_renumber: Dict[Tuple[int, int], int] = {}
    next_ids = {"image": 1, "anno": 1, "pair": 0}
    merged = {name: {"images": [], "annotations": []} for name in SET_NAMES}

    for cat, sets in per_cat.items():
        for set_name in SET_NAMES:
            save_path = crop_tmp / cat / set_name
            save_path.mkdir(exist_ok=True, parents=True)
            per_image: Dict[int, List[Dict]] = defaultdict(list)
            for a in sets[set_name]:
                per_image[a["image_id"]].append(a)
            for img_id, annos in per_image.items():
                fname = _photo_filename(img_id)
                src = images_dir / fname
                if not src.is_file():
                    continue
                image_open = Image.open(src)
                for idx, anno in enumerate(annos):
                    stem, ext = os.path.splitext(fname)
                    new_name = f"{stem}_{anno['style']}_{idx}{ext}"
                    if anno["bbox"] != "":
                        bb = [int(v) for v in anno["bbox"]]
                        if (
                            bb[2] == 0 or bb[3] == 0
                            or anno["area"] < minimum_bbox_area
                        ):
                            continue
                        cropped = crop_bbox_xywh(image_open, bb, target_wh)
                    else:
                        cropped = letterbox_resize(image_open, target_wh)
                    cropped.save(save_path / new_name)

                    key = (anno["pair_id"], anno["style"])
                    if key not in pair_renumber:
                        pair_renumber[key] = next_ids["pair"]
                        next_ids["pair"] += 1
                    merged[set_name]["images"].append(
                        image_info(next_ids["image"], target_wh[0],
                                   target_wh[1], new_name)
                    )
                    merged[set_name]["annotations"].append(
                        reid_annotation(
                            next_ids["anno"], next_ids["image"],
                            anno["category_id"], pair_id=pair_renumber[key],
                            style=anno["style"], source=anno["source"],
                            area=anno["area"],
                        )
                    )
                    next_ids["image"] += 1
                    next_ids["anno"] += 1

    # save merged jsons + scatter images (reference :425-629)
    final_root = root / f"images_reid_cropped_{target_wh[0]}_{target_wh[1]}"
    for set_name in SET_NAMES:
        save_json(merged[set_name], out / f"{set_name}_coco_reid.json")
        target_dir = final_root / set_name
        target_dir.mkdir(exist_ok=True, parents=True)
        for info in merged[set_name]["images"]:
            for cat in per_cat:
                src = crop_tmp / cat / set_name / info["file_name"]
                if src.is_file():
                    dst = target_dir / info["file_name"]
                    if not dst.is_file():
                        shutil.move(str(src), str(dst))
    log.info(f"Removing temporary folder with images: {crop_tmp}")
    shutil.rmtree(crop_tmp, ignore_errors=True)
    return merged
