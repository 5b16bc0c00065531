#!/usr/bin/env bash
# End-to-end smoke: tiny synthetic training run + checkpoint + resume.
# Runs anywhere (CPU or TPU); ~2-4 minutes on a 1-core CPU host.
set -e
SNAP=$(mktemp -d)
COMMON="--data-set synthetic --teacher-layers 1,1,1,1 --input-size 128,128 \
 --batch-size 2 --num-steps 2 --log-every 1 --ho false --compute-dtype float32 \
 --snapshot-dir $SNAP --log-path $SNAP/log"
python -m structure_knowledge_distillation_tpu.cli.train $COMMON
python -m structure_knowledge_distillation_tpu.cli.train $COMMON --S_resume true --num-steps 4
echo "smoke OK (snapshots in $SNAP)"
