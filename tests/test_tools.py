"""Data-prep tooling tests: bbox transforms, jpg conversion, and the full
Street2Shop / DeepFashion pipelines on synthetic miniature datasets —
including feeding the produced jsons back into the training data layer."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from centroids_reid_tpu.tools.coco import (
    bbox_coco_to_corners,
    bbox_coco_to_yolo,
    bbox_corners_to_coco,
    bbox_s2s_to_coco,
    bbox_yolo_to_coco,
)
from centroids_reid_tpu.tools.images import convert_dir_to_jpg


def test_bbox_transforms_roundtrip():
    bbox = [10, 20, 30, 40]
    assert bbox_coco_to_corners(bbox) == [10, 20, 40, 60]
    assert bbox_corners_to_coco([10, 20, 40, 60]) == bbox
    yolo = bbox_coco_to_yolo(list(bbox), 100, 200)
    assert bbox_yolo_to_coco(yolo, 100, 200) == bbox
    assert bbox_s2s_to_coco(
        {"left": 1, "top": 2, "width": 3, "height": 4}
    ) == [1, 2, 3, 4]


def test_convert_to_jpg(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (8, 8, 4), np.uint8), "RGBA"
        ).save(src / f"img{i}.png")
    (src / "broken.png").write_bytes(b"not an image")
    ok, failed = convert_dir_to_jpg(src, dst, num_threads=2)
    assert ok == 3 and failed == 1
    assert sorted(os.listdir(dst)) == ["img0.jpg", "img1.jpg", "img2.jpg"]
    assert Image.open(dst / "img0.jpg").mode == "RGB"


def _make_s2s(tmp_path):
    """Tiny Street2Shop: 2 categories, a few products."""
    root = tmp_path / "s2s"
    meta = root / "meta" / "json"
    images = root / "images"
    meta.mkdir(parents=True)
    images.mkdir(parents=True)
    rng = np.random.RandomState(0)

    def img(photo_id):
        name = str(photo_id).zfill(9) + ".jpg"
        Image.fromarray(
            rng.randint(0, 255, (60, 50, 3), np.uint8)
        ).save(images / name)

    def bb():
        return {"left": 5, "top": 5, "width": 30, "height": 40}

    # category 'bags': products 100 (train), 200 (test)
    data = {
        "train_pairs_bags": [
            {"photo": 1, "product": 100, "bbox": bb()},
            {"photo": 2, "product": 100, "bbox": bb()},
        ],
        "test_pairs_bags": [{"photo": 3, "product": 200, "bbox": bb()}],
        "retrieval_bags": [
            {"photo": 10, "product": 100},
            {"photo": 11, "product": 200},
            {"photo": 12, "product": 200},
        ],
        # category 'tops': product 300 (train only)
        "train_pairs_tops": [
            {"photo": 4, "product": 300, "bbox": bb()},
            {"photo": 5, "product": 300, "bbox": bb()},
        ],
        "test_pairs_tops": [],
        "retrieval_tops": [{"photo": 13, "product": 300}],
    }
    for stem, items in data.items():
        (meta / f"{stem}.json").write_text(json.dumps(items))
    for pid in (1, 2, 3, 4, 5, 10, 11, 12, 13):
        img(pid)
    return root


def test_street2shop_pipeline(tmp_path):
    from centroids_reid_tpu.tools import (
        street2shop_coco_to_reid,
        street2shop_to_coco,
    )

    root = _make_s2s(tmp_path)
    coco = street2shop_to_coco(root, "meta", "images", "coco_out")
    assert len(coco["images"]) == 5  # train(4) + test(1) street photos
    assert {c["name"] for c in coco["categories"]} >= {"bags", "tops"}

    merged = street2shop_coco_to_reid(
        root, "meta", "images", "reid_out", target_image_size=(32, 32)
    )
    # train: street photos of train products + their shop photos
    train_sources = {a["source"] for a in merged["train"]["annotations"]}
    assert train_sources == {"user", "shop"}
    # query = test street (user) photos; gallery = shop photos of non-train
    assert all(
        a["source"] == "user" for a in merged["query"]["annotations"]
    )
    assert all(
        a["source"] == "shop" for a in merged["gallery"]["annotations"]
    )
    # images scattered per set
    img_root = root / "images_reid_cropped_32_32"
    for s in ("train", "query", "gallery"):
        files = os.listdir(img_root / s)
        assert len(files) == len(merged[s]["images"])
        assert all(Image.open(img_root / s / f).size == (32, 32) for f in files)

    # the produced jsons feed the training data layer
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.data import init_dataset

    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = str(img_root)
    cfg.DATASETS.JSON_TRAIN_PATH = str(root / "reid_out" / "train_coco_reid.json")
    ds = init_dataset("street2shop", cfg)
    assert ds.num_classes >= 1
    assert ds.num_query == len(merged["query"]["images"])


def _make_deepfashion(tmp_path):
    root = tmp_path / "df"
    rng = np.random.RandomState(0)
    products = {
        "id_001": ("img/TOPS/Tee/id_001", "train"),
        "id_002": ("img/TOPS/Tee/id_002", "test"),
        "id_003": ("img/DRESS/Maxi/id_003", "val"),
    }
    part_lines = ["header\n", "header\n"]
    bbox_lines = ["header\n", "header\n"]
    for dir_name, (source, subset) in products.items():
        high = root / "img_highres" / source[4:]
        low = root / "img_low_res" / source[4:]
        high.mkdir(parents=True)
        low.mkdir(parents=True)
        for i, src_code in enumerate(("1", "2")):  # one shop + one user photo
            fname = f"{'shop' if src_code == '1' else 'user'}_{i:02d}.jpg"
            Image.fromarray(
                rng.randint(0, 255, (80, 60, 3), np.uint8)
            ).save(high / fname)
            Image.fromarray(
                rng.randint(0, 255, (40, 30, 3), np.uint8)
            ).save(low / fname)
            part_lines.append(
                f"{source}/{fname} {dir_name} {subset}\n"
            )
            bbox_lines.append(
                f"{source}/{fname} 1 {src_code} 2 2 25 35\n"
            )
    (root / "Eval").mkdir()
    (root / "Anno").mkdir()
    (root / "Eval/list_eval_partition.txt").write_text("".join(part_lines))
    (root / "Anno/list_bbox_consumer2shop.txt").write_text("".join(bbox_lines))
    return root


def test_deepfashion_pipeline(tmp_path):
    from centroids_reid_tpu.tools import deep_fashion_to_reid

    root = _make_deepfashion(tmp_path)
    all_images, all_annos = deep_fashion_to_reid(root, (32, 32))

    for subset in ("train", "val", "test"):
        assert len(all_images[subset]) == 2
        path = root / f"{subset}_reid_cropped_32_32.json"
        assert path.exists()

    query = json.loads((root / "query_reid_cropped_32_32.json").read_text())
    gallery = json.loads((root / "gallery_reid_cropped_32_32.json").read_text())
    # query = test user photos; gallery = test shop + val shop
    assert len(query["annotations"]) == 1
    assert all(a["source"] == "user" for a in query["annotations"])
    assert len(gallery["annotations"]) == 2
    assert all(a["source"] == "shop" for a in gallery["annotations"])
    # relabelled pair ids are contiguous over the union
    pids = {a["pair_id"] for a in query["annotations"]} | {
        a["pair_id"] for a in gallery["annotations"]
    }
    assert pids == set(range(len(pids)))
    # cropped images exist and are letterboxed to target
    crop_root = root / "32_32_cropped_images"
    for mode in ("train", "query", "gallery"):
        for f in os.listdir(crop_root / mode):
            assert Image.open(crop_root / mode / f).size == (32, 32)
