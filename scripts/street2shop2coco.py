#!/usr/bin/env python
"""Transform original Exact Street2Shop annotations to COCO format.

Flag surface mirrors /root/reference/scripts/street2shop2coco.py:27-55.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from centroids_reid_tpu.tools import street2shop_to_coco  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))

if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Script to transform original Exact Street2Shop annotations to COCO format."
    )
    p.add_argument("--root-dir-path", type=str, required=True)
    p.add_argument("--metadata-dir", type=str, required=True)
    p.add_argument("--images-dir", type=str, required=True)
    p.add_argument("--save-dir", type=str, required=True)
    args = p.parse_args()
    street2shop_to_coco(
        args.root_dir_path, args.metadata_dir, args.images_dir, args.save_dir
    )
