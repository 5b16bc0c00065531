#!/usr/bin/env bash
# End-to-end smoke: tiny synthetic training run + checkpoint + resume.
# Forces the CPU backend from inside the process: in this environment jax is
# imported (and the axon TPU platform pinned) by sitecustomize before any
# user code, so JAX_PLATFORMS=cpu in the environment is IGNORED — only
# jax.config.update("jax_platforms", "cpu") before first device use works
# (see CLAUDE.md "Environment quirks"). ~2-4 minutes on a 1-core CPU host.
set -e
SNAP=$(mktemp -d)
COMMON="--data-set synthetic --teacher-layers 1,1,1,1 --input-size 128,128 \
 --batch-size 2 --num-steps 2 --log-every 1 --ho false --compute-dtype float32 \
 --snapshot-dir $SNAP --log-path $SNAP/log"
run_cpu() {
  python -c "
import sys, jax
jax.config.update('jax_platforms', 'cpu')
from structure_knowledge_distillation_tpu.cli.train import main
main(sys.argv[1:])
" $@
}
run_cpu $COMMON
run_cpu $COMMON --S_resume true --num-steps 4
echo "smoke OK (snapshots in $SNAP)"
