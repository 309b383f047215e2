#!/usr/bin/env python
"""Transform COCO-format Street2Shop annotations to ReID-ready COCO format.

Flag surface mirrors /root/reference/scripts/street2shop_coco2reid.py:474-527.
(--train-json-path is accepted for compatibility; the pipeline derives the
needed info from the metadata jsons directly.)
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from centroids_reid_tpu.tools import street2shop_coco_to_reid  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))

if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Script to transform COCO-format Street2Shop annotations to ReID-ready COCO format."
    )
    p.add_argument("--train-json-path", type=str, required=False, default="")
    p.add_argument("--root-dir-path", type=str, required=True)
    p.add_argument("--metadata-dir", type=str, required=True)
    p.add_argument("--images-dir", type=str, required=True)
    p.add_argument("--save-dir", type=str, required=True)
    p.add_argument("--target-image-size", type=int, nargs="+", default=[320, 320])
    p.add_argument("--minimum-bbox-area", type=int, default=1)
    args = p.parse_args()
    street2shop_coco_to_reid(
        args.root_dir_path, args.metadata_dir, args.images_dir, args.save_dir,
        tuple(args.target_image_size), args.minimum_bbox_area,
    )
