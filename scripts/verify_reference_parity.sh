#!/usr/bin/env bash
# One-command accuracy-parity check against a reference checkpoint.
#
# Runs the TEST.ONLY_TEST double evaluation (centroids on AND off, exactly
# like /root/reference/utils/misc.py:128-139) from a reference Lightning
# .ckpt (converted on load by centroids_reid_tpu/models/convert.py) or a
# native orbax checkpoint dir, then ASSERTS centroid-mode mAP / Rank-1
# against the published CTL results (arXiv:2104.13643; table hard-coded in
# scripts/assert_parity.py) and exits non-zero on any miss — reference
# parity is one command with a pass/fail once data + weights are mounted.
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
exec python scripts/assert_parity.py --config_file "$CONFIG" \
  --ckpt "$CKPT" --root "$ROOT" --dataset "$NAME" "$@"
