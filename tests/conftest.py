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
