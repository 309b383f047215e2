#!/usr/bin/env python
"""Train / evaluate the non-centroid baseline model.

CLI surface mirrors /root/reference/train_base_model.py:126-146; the
training step omits the centroid machinery (query triplet + center + xent
only) and typically runs with DATALOADER.USE_RESAMPLING True so every
sample is real.
"""

import argparse
from pathlib import Path

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import run_main


def main():
    parser = argparse.ArgumentParser(description="Baseline Model Training (TPU)")
    parser.add_argument(
        "--config_file", default="", help="path to config file", type=str
    )
    parser.add_argument(
        "opts",
        help="Modify config options from the command line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    run_main(cfg, "base", Path(__file__).stem)


if __name__ == "__main__":
    main()
