"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding and
cross-replica collectives (sync-BN, gradient reduction) are exercised without
TPU hardware (the reference's queue-based sync BN had no such simulation path;
see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The axon sitecustomize imports jax at interpreter startup (before conftest),
# so JAX_PLATFORMS in os.environ is snapshotted as "axon" — override through
# the live config instead. XLA_FLAGS is read at backend-client creation, which
# hasn't happened yet, so the host-device-count flag above still applies.
jax.config.update("jax_platforms", "cpu")

# Convs/dots must run at exact f32 for parity-vs-torch assertions.
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is compile-dominated (full-model train steps at 256²+ on one CPU
# core take minutes each to build). A persistent XLA compile cache makes
# repeat suite runs hit warm entries; results are unaffected. The directory is
# host-fingerprinted: AOT CPU executables are ISA-specific, and a cache dir
# carried to a different machine (fs snapshot) would otherwise load foreign
# code (cpu_aot_loader "+feature is not supported … SIGILL" warnings).
from structure_knowledge_distillation_tpu.utils.compile_cache import (  # noqa: E402
    host_keyed_cache_dir,
)

try:
    jax.config.update("jax_compilation_cache_dir",
                      host_keyed_cache_dir("/tmp/sskd_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
