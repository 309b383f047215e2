#!/usr/bin/env python
"""Build a gallery embedding index from an image folder.

Flag surface mirrors /root/reference/inference/create_embeddings.py:36-63;
outputs ``embeddings.npy`` + ``paths.npy`` under OUTPUT_DIR. With
MODEL.USE_CENTROIDS True the index holds per-pid centroids, with pids
extracted from the parent directory (default) or the filename suffix
(``--pid_from filename``).

  python inference/create_embeddings.py --config_file configs/256_resnet50.yml \\
      MODEL.PRETRAIN_PATH ckpt DATASETS.ROOT_DIR /imgs OUTPUT_DIR /out
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroids_reid_tpu.config import get_default_cfg  # noqa: E402
from centroids_reid_tpu.inference import build_embeddings  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))


def main():
    parser = argparse.ArgumentParser(
        description="Create embeddings for images that will serve as the database (gallery)"
    )
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--images-in-subfolders", action="store_true")
    parser.add_argument("--print_freq", type=int, default=10)
    parser.add_argument(
        "--pid_from", choices=["parent_dir", "filename"], default="parent_dir",
        help="how to derive pids for centroid grouping",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    from centroids_reid_tpu.utils import enable_compile_cache

    enable_compile_cache()
    build_embeddings(
        cfg, args.images_in_subfolders, args.print_freq, args.pid_from
    )


if __name__ == "__main__":
    main()
