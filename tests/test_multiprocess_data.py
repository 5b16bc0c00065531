"""REAL two-process execution of the multi-controller data path.

`put_global`'s multi-process branch (jax.make_array_from_process_local_data,
data/prefetch.py) previously had only a single-process contract test
(test_data_eval.py::test_batch_iterator_process_shards_partition_each_global_batch).
Here two actual OS processes jax.distributed-initialize a CPU cluster
(2 local devices each → 4 global), each feeds its batch_iterator shard
through put_global, and the assembled global array is all-gathered and
checked against the unsharded batch — see tests/mp_worker_put_global.py.

Reference counterpart being out-proven: utils/parallel.py:16 (single-process
torch.cuda.comm scatter); this is the TPU-pod multi-host story actually
executing, not just designed.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker_put_global.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_put_global_two_real_processes():
    port = _free_port()
    env = dict(os.environ)
    # Belt and braces: the worker pins the platform via live config (env
    # vars are too late under sitecustomize), but scrub any XLA_FLAGS the
    # test session exported so the two configs cannot fight.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_OK {i}" in out, f"worker {i} missing sentinel:\n{out}"
