#!/usr/bin/env python
"""Top-k retrieval of gallery entries for a folder of query images.

Flag surface mirrors /root/reference/inference/get_similar.py:28-71;
outputs ``results.npy`` (dict: query path -> {indices, paths, distances}),
``query_embeddings.npy`` and ``query_paths.npy`` under OUTPUT_DIR. The
ranking runs on-device: fused Pallas distance+top-k when
TPU.USE_PALLAS_RETRIEVAL and --topk > 0, else a chunked exact distmat.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroids_reid_tpu.config import get_default_cfg  # noqa: E402
from centroids_reid_tpu.inference import find_similar  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))


def main():
    parser = argparse.ArgumentParser(
        description="Find top-k most similar gallery entries per query image"
    )
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--images-in-subfolders", action="store_true")
    parser.add_argument("--print_freq", type=int, default=10)
    parser.add_argument(
        "--gallery_data", type=str,
        help="path to root where previously prepared embeddings and paths were saved",
    )
    parser.add_argument("--normalize_features", action="store_true")
    parser.add_argument(
        "--topk", type=int, default=100,
        help="top k similar ids per query; 0 returns all",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    from centroids_reid_tpu.utils import enable_compile_cache

    enable_compile_cache()
    find_similar(
        cfg,
        gallery_data=args.gallery_data,
        images_in_subfolders=args.images_in_subfolders,
        normalize_features=args.normalize_features,
        topk=args.topk,
        print_freq=args.print_freq,
    )


if __name__ == "__main__":
    main()
