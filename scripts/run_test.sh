#!/usr/bin/env bash
# Test-server submission — counterpart of reference run_test.sh.
set -e
python -m structure_knowledge_distillation_tpu.cli.test \
    --resume-from "${RESUME_FROM:?set RESUME_FROM to a student checkpoint}" \
    --data-dir "${DATA_DIR:-../cityscapes}" \
    "$@"
