#!/usr/bin/env bash
# CamVid ESPNet-student transfer config (reference README.md:12-18 capability).
set -e
python -m structure_knowledge_distillation_tpu.cli.train \
    --data-set camvid \
    --data-dir "${DATA_DIR:-../camvid}" \
    --data-list "${DATA_LIST:-./dataset/list/camvid/train.lst}" \
    --val-data-list "${VAL_LIST:-./dataset/list/camvid/val.lst}" \
    --classes_num 11 \
    --student-arch espnet \
    --input-size 360,480 \
    --imsize-for-adv 46 \
    --random-mirror --random-scale \
    --batch-size 8 --num-steps 20000 \
    --pi true --pa true --ho false \
    "$@"
