#!/usr/bin/env bash
# CTL model on Market1501 — canonical small (s) person-reid recipe.
python train_ctl_model.py \
--config_file="configs/256_resnet50.yml" \
DATASETS.NAMES 'market1501' \
DATASETS.ROOT_DIR '/data/' \
SOLVER.IMS_PER_BATCH 16 \
TEST.IMS_PER_BATCH 128 \
SOLVER.BASE_LR 0.00035 \
OUTPUT_DIR './logs/market1501/256_resnet50' \
DATALOADER.USE_RESAMPLING False \
USE_MIXED_PRECISION False \
MODEL.USE_CENTROIDS True
