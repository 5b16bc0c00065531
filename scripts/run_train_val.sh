#!/usr/bin/env bash
# Full Cityscapes KD recipe — counterpart of reference run_train_val.sh.
set -e
is_pi_use=true
is_pa_use=true
is_ho_use=true
lambda_pi=10.0
lambda_d=0.1

python -m structure_knowledge_distillation_tpu.cli.train \
    --random-mirror \
    --random-scale \
    --weight-decay 5e-4 \
    --data-dir "${DATA_DIR:-../cityscapes}" \
    --batch-size 8 \
    --num-steps 40000 \
    --T_ckpt_path "${TEACHER_CKPT:-./ckpt/teacher_pspnet_r101.pth}" \
    --is-student-load-imgnet true \
    --student-pretrain-model-imgnet "${STUDENT_IMGNET:-./ckpt/resnet18-imagenet.pth}" \
    --pi ${is_pi_use} \
    --pa ${is_pa_use} \
    --ho ${is_ho_use} \
    --lambda-pa 0.5 \
    --pool-scale 0.5 \
    --lambda-pi ${lambda_pi} \
    --lambda-d ${lambda_d} \
    "$@"
