"""COCO-ReID json building blocks and bbox format transforms.

Output schemas match the reference prep tooling exactly
(/root/reference/scripts/data_utils.py:127-178,
data_format_transforms.py) so the produced JSONs interchange with the
reference's data layer: annotations carry the extra ``pair_id`` / ``style``
/ ``source`` fields the re-id loader consumes (datasets/bases.py:231-238).
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence

S2S_CATEGORIES = [
    "bags", "belts", "dresses", "eyewear", "footwear", "hats",
    "leggings", "outerwear", "pants", "skirts", "tops",
]


def load_json(path):
    with open(path) as f:
        return json.load(f)


def save_json(obj, path):
    with open(path, "w") as f:
        json.dump(obj, f)


def image_info(image_id, width, height, file_name, license=0,
               flickr_url="", coco_url="", date_captured="") -> Dict:
    return {
        "id": int(image_id),
        "file_name": file_name,
        "width": width,
        "height": height,
        "license": license,
        "flickr_url": flickr_url,
        "coco_url": coco_url,
        "date_captured": date_captured,
    }


def reid_annotation(anno_id, image_id, category_id, bbox="", pair_id=0,
                    style="", segmentation="", source="", area=0,
                    iscrowd=0) -> Dict:
    return {
        "id": int(anno_id),
        "image_id": int(image_id),
        "category_id": int(category_id),
        "segmentation": segmentation,
        "area": area,
        "bbox": bbox,
        "iscrowd": int(iscrowd),
        "pair_id": int(pair_id),
        "style": style,
        "source": source,
    }


def plain_annotation(anno_id, image_id, category_id, bbox,
                     segmentation="", area="", iscrowd=0) -> Dict:
    return {
        "id": int(anno_id),
        "image_id": int(image_id),
        "category_id": int(category_id),
        "segmentation": segmentation,
        "area": area,
        "bbox": bbox,
        "iscrowd": int(iscrowd),
    }


def dataset_header(year=2019, version=1.0) -> Dict:
    return {
        "info": {
            "year": year, "version": version, "description": "",
            "contributor": "", "url": "", "date_created": "",
        },
        "licenses": {"id": 0, "name": "", "url": ""},
    }


def category_entry(category_id, name, supercategory="fashion") -> Dict:
    return {"id": category_id, "name": name, "supercategory": supercategory}


# ---------------------------------------------------------------------------
# bbox format transforms (coco = [x, y, w, h])
# ---------------------------------------------------------------------------


def bbox_s2s_to_coco(bbox: Dict) -> List:
    return [bbox["left"], bbox["top"], bbox["width"], bbox["height"]]


def bbox_coco_to_corners(b: Sequence) -> List:
    return [b[0], b[1], b[0] + b[2], b[1] + b[3]]


def bbox_corners_to_coco(b: Sequence) -> List:
    return [b[0], b[1], b[2] - b[0], b[3] - b[1]]


def bbox_coco_to_center(b: Sequence) -> List:
    return [b[0] + b[2] / 2, b[1] + b[3] / 2, b[2], b[3]]


def bbox_center_to_coco(b: Sequence) -> List:
    return [b[0] - b[2] / 2, b[1] - b[3] / 2, b[2], b[3]]


def bbox_center_to_yolo(b: Sequence, width, height) -> List:
    return [b[0] / width, b[1] / height, b[2] / width, b[3] / height]


def bbox_yolo_to_center(b: Sequence, width, height) -> List:
    return [b[0] * width, b[1] * height, b[2] * width, b[3] * height]


def bbox_coco_to_yolo(b: Sequence, width, height) -> List:
    return bbox_center_to_yolo(bbox_coco_to_center(b), width, height)


def bbox_yolo_to_coco(b: Sequence, width, height) -> List:
    b = [float(x) for x in b]
    return [int(x) for x in bbox_center_to_coco(
        bbox_yolo_to_center(b, width, height)
    )]
