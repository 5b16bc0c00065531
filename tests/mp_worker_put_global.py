"""Worker for the REAL multi-process put_global test (not a pytest file).

Launched twice (process_id 0 and 1) by
tests/test_multiprocess_data.py::test_put_global_two_real_processes. Each
process forces the CPU platform with 2 local virtual devices, joins a
2-process jax.distributed cluster (4 global devices), draws its OWN shard
of the global batch through `batch_iterator(num_shards, shard_index)`, and
places it with `put_global` — executing the
jax.make_array_from_process_local_data branch (data/prefetch.py) that the
single-process suite can only contract-test. The assembled global array is
then all-gathered (a real cross-process collective) and asserted equal to
the unsharded single-process batch.

Reference gap being out-proven: the reference is single-process
(torch.cuda.comm scatter in utils/parallel.py:16); this path is the
multi-controller TPU-pod equivalent.
"""

from __future__ import annotations

import os
import sys

import numpy as np

# Launched as `python tests/mp_worker_put_global.py` — sys.path[0] is tests/,
# so the package root must be added explicitly (pytest's conftest does this
# for in-process tests, but this worker is a fresh interpreter).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # Hermetic CPU: env vars are too late in this environment (sitecustomize
    # imports jax first) — live config only, same as tests/conftest.py.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from structure_knowledge_distillation_tpu.data import (
        SyntheticSegDataset,
        batch_iterator,
    )
    from structure_knowledge_distillation_tpu.data.prefetch import put_global

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    global_batch = 4
    ds = SyntheticSegDataset(length=8, crop_size=(8, 8), num_classes=5)
    local_batches = list(batch_iterator(
        ds, global_batch, shuffle=True, seed=7,
        num_shards=nprocs, shard_index=proc_id))
    # The unsharded reference order every process can compute independently
    # (batch_iterator's multi-host contract: identical shuffled order, each
    # process takes its contiguous slice).
    ref_batches = list(batch_iterator(ds, global_batch, shuffle=True, seed=7))
    assert len(local_batches) == len(ref_batches) == 2

    gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    for (l_img, l_lbl, *_), (g_img, g_lbl, *_) in zip(local_batches, ref_batches):
        assert l_img.shape[0] == global_batch // nprocs
        img = put_global(l_img, sharding)  # the multi-process branch
        lbl = put_global(l_lbl.astype(np.int32), sharding)
        assert img.shape[0] == global_batch  # logically global
        # Replicate = all-gather across the two processes, then compare the
        # now-locally-addressable value with the single-process batch.
        np.testing.assert_array_equal(np.asarray(gather(img)), g_img)
        np.testing.assert_array_equal(
            np.asarray(gather(lbl)), g_lbl.astype(np.int32))
        # And a cross-process reduction over the same arrays for good
        # measure: a global-sum computed from per-process shards must match
        # the host sum of the full batch.
        dev_sum = float(jax.jit(jnp.sum)(img))
        np.testing.assert_allclose(dev_sum, np.float64(g_img.sum()),
                                   rtol=1e-4)  # f32 accumulation-order slack

    print(f"MP_OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
