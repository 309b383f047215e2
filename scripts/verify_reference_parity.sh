#!/usr/bin/env bash
# One-command accuracy-parity check against a reference checkpoint.
#
# Runs the TEST.ONLY_TEST double evaluation (centroids on AND off, exactly
# like /root/reference/utils/misc.py:128-139) from a reference Lightning
# .ckpt (converted on load by centroids_reid_tpu/models/convert.py) or a
# native orbax checkpoint dir, and prints mAP / Top-k for both eval modes —
# compare against the paper tables (arXiv:2104.13643) / the numbers the
# reference repo's linked weights reproduce (README.md:98-100).
#
# Usage:
#   scripts/verify_reference_parity.sh CKPT DATASET_ROOT \
#       [DATASET_NAME] [CONFIG] [EXTRA KEY VALUE ...]
#
#   CKPT          path to market1501_resnet50_256_128_epoch_120.ckpt (etc.)
#                 or an orbax checkpoint directory saved by this framework
#   DATASET_ROOT  directory containing market1501/ (or dukemtmcreid/, ...)
#   DATASET_NAME  default market1501
#   CONFIG        default configs/256_resnet50.yml
#
# Example (reference Market1501 weights):
#   scripts/verify_reference_parity.sh \
#       ~/ckpts/market1501_resnet50_256_128_epoch_120.ckpt /data
set -euo pipefail

CKPT=${1:?usage: verify_reference_parity.sh CKPT DATASET_ROOT [NAME] [CONFIG]}
ROOT=${2:?usage: verify_reference_parity.sh CKPT DATASET_ROOT [NAME] [CONFIG]}
NAME=${3:-market1501}
CONFIG=${4:-configs/256_resnet50.yml}
shift $(( $# > 4 ? 4 : $# ))

cd "$(dirname "$0")/.."
exec python train_ctl_model.py --config_file "$CONFIG" \
  TEST.ONLY_TEST True \
  MODEL.PRETRAIN_PATH "$CKPT" \
  DATASETS.NAMES "$NAME" \
  DATASETS.ROOT_DIR "$ROOT" \
  MODEL.USE_CENTROIDS True \
  REPRODUCIBLE_NUM_RUNS 1 \
  "$@"
