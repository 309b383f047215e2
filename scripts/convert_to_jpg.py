#!/usr/bin/env python
"""Convert all images in a folder to RGB JPEG (threaded).

Flag surface mirrors /root/reference/scripts/convert_to_jpg.py:32-54.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from centroids_reid_tpu.tools.images import convert_dir_to_jpg  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))
log = logging.getLogger(__name__)

if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Script to transform all images in a folder to jpg."
    )
    p.add_argument("--source-dir-path", type=str, required=True)
    p.add_argument("--target-dir-path", type=str, required=True)
    p.add_argument("--num-threads", type=int, default=4)
    args = p.parse_args()
    ok, failed = convert_dir_to_jpg(
        args.source_dir_path, args.target_dir_path, args.num_threads
    )
    log.info("Processing finished.")
    log.info(f"Successful images: {ok}")
    log.info(f"Failed images: {failed}")
