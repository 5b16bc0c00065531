"""Coverage for auxiliary subsystems: device prefetch, metrics writer,
and the extra ABN building blocks (SURVEY §5 metrics/logging + C15)."""

import json

import jax
import jax.numpy as jnp
import numpy as np


def test_device_prefetch_preserves_order_and_metadata():
    from structure_knowledge_distillation_tpu.data.prefetch import device_prefetch

    batches = [(np.full((2, 4), i, np.float32), f"name{i}") for i in range(5)]
    out = list(device_prefetch(iter(batches), buffer_size=2))
    assert len(out) == 5
    for i, (arr, name) in enumerate(out):
        assert isinstance(arr, jax.Array)  # staged onto a device
        assert float(np.asarray(arr)[0, 0]) == i
        assert name == f"name{i}"  # non-array metadata passes through


def test_device_prefetch_propagates_producer_errors():
    from structure_knowledge_distillation_tpu.data.prefetch import device_prefetch

    def gen():
        yield (np.zeros((1,), np.float32),)
        raise RuntimeError("boom")

    it = device_prefetch(gen(), buffer_size=1)
    next(it)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(it)  # the producer-thread error must surface, not truncate


def test_metrics_writer_jsonl_roundtrip(tmp_path):
    from structure_knowledge_distillation_tpu.utils import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write(1, {"g_loss": 1.5, "d_loss": 0.25})
    w.write(2, {"g_loss": 1.25})
    w.close()
    lines = [json.loads(l) for l in
             (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["g_loss"] == 1.5
    assert lines[1]["step"] == 2


def test_abn_blocks_forward_shapes():
    from structure_knowledge_distillation_tpu.models.abn_blocks import (
        DenseModule,
        GlobalAvgPool2d,
        IdentityResidualBlock,
    )

    x = jnp.ones((2, 8, 8, 16))
    assert GlobalAvgPool2d().apply({}, x).shape == (2, 16)

    dense = DenseModule(growth=4, layers=2)
    v = dense.init(jax.random.PRNGKey(0), x, train=False)
    y = dense.apply(v, x, train=False)
    assert y.shape[-1] == 16 + 2 * 4

    res = IdentityResidualBlock(channels=(8, 16))
    v = res.init(jax.random.PRNGKey(1), x, train=False)
    y = res.apply(v, x, train=False)
    assert y.shape == x.shape


def test_bench_tpu_probe_paths():
    """bench._wait_for_tpu: the success path returns after one subprocess
    probe; exhausted retries fall through (return) so the real run surfaces
    its own error. Probe code is injected — the default probes the
    environment's default platform, which tests must not touch."""
    import time

    from bench import _wait_for_tpu

    t0 = time.perf_counter()
    _wait_for_tpu(max_tries=2, probe_timeout_s=60, retry_wait_s=1,
                  probe_code="pass")
    assert time.perf_counter() - t0 < 30
    t0 = time.perf_counter()
    _wait_for_tpu(max_tries=2, probe_timeout_s=30, retry_wait_s=1,
                  probe_code="raise SystemExit(1)")  # must not raise
    assert time.perf_counter() - t0 < 30


def test_host_keyed_cache_dir_is_stable_and_feature_keyed():
    """Persistent-compile-cache dirs are suffixed with a digest of the host
    CPU's feature set: stable within a host (warm re-runs hit the same dir),
    import-light (no jax), and distinct from the bare base path so a
    foreign-host cache dir is never opened (AOT CPU executables embed
    ISA-specific code — loading another machine's entries risks SIGILL)."""
    from structure_knowledge_distillation_tpu.utils.compile_cache import (
        host_keyed_cache_dir,
    )

    a = host_keyed_cache_dir("/tmp/x")
    b = host_keyed_cache_dir("/tmp/x")
    assert a == b, "must be deterministic on one host"
    assert a.startswith("/tmp/x-") and len(a) == len("/tmp/x-") + 12
    assert host_keyed_cache_dir("/tmp/y").endswith(a.rsplit("-", 1)[1])
