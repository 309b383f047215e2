#!/usr/bin/env python
"""Transform DeepFashion Consumer-to-Shop annotations to ReID-ready COCO format.

Flag surface mirrors /root/reference/scripts/deep_fashion2reid.py:321-341.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from centroids_reid_tpu.tools import deep_fashion_to_reid  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))

if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Script to transform DeepFashion Consumer-to-Shop annotations to ReID-ready COCO format."
    )
    p.add_argument("--root-dir-path", type=str, required=True)
    p.add_argument("--target-image-size", type=int, nargs="+", default=[320, 320])
    args = p.parse_args()
    deep_fashion_to_reid(args.root_dir_path, tuple(args.target_image_size))
