#!/usr/bin/env python
"""Train / evaluate the Centroid Triplet Loss (CTL) model.

CLI surface mirrors the reference entry point
(/root/reference/train_ctl_model.py:182-202): ``--config_file`` plus
trailing ``KEY VALUE`` config overrides, e.g.

  python train_ctl_model.py --config_file configs/256_resnet50.yml \\
      GPU_IDS [0] DATASETS.NAMES 'market1501' DATASETS.ROOT_DIR '/data' \\
      SOLVER.IMS_PER_BATCH 16 MODEL.USE_CENTROIDS True
"""

import argparse
from pathlib import Path

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import run_main


def main():
    parser = argparse.ArgumentParser(description="CTL Model Training (TPU)")
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

    run_main(cfg, "ctl", Path(__file__).stem)


if __name__ == "__main__":
    main()
