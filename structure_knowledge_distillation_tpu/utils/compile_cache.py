"""Host-fingerprinted persistent-compile-cache directories.

XLA's persistent cache stores AOT-compiled CPU executables that embed
host-ISA-specific code paths. The cache key does NOT include the host CPU's
feature set, so a cache directory written on one machine and reused on another
(e.g. via a filesystem snapshot) loads executables compiled for a different
ISA — observed as `cpu_aot_loader.cc: "+prefer-no-scatter is not supported on
the host machine … could lead to execution errors such as SIGILL"` on every
loaded entry. Today XLA deopts with a warning; on a harder feature mismatch it
is a SIGILL inside whatever check is running.

Fix: key the cache *directory name* by a digest of the host's CPU features,
so a different-featured host starts cold instead of loading foreign AOT code.
This module is import-light (no jax) so test conftest can use it before any
backend initialization.
"""

from __future__ import annotations

import hashlib
import platform

__all__ = ["host_keyed_cache_dir"]


def _cpu_feature_fingerprint() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """`{base}-{fingerprint}`: same machine → same warm dir; a host with
    different CPU features gets a fresh (cold, but safe) directory."""
    return f"{base}-{_cpu_feature_fingerprint()}"
