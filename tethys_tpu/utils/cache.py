"""Persistent-compile-cache setup with a host-fingerprinted directory.

Why: /tmp may be shared (or snapshotted) across hosts with different CPU
micro-architectures.  XLA:CPU AOT artifacts embed machine features; loading
one compiled on a different host triggers cpu_aot_loader machine-feature
warnings ("could lead to execution errors such as SIGILL") and ~500 s stalls
re-verifying/recompiling (BASELINE.md round-3 environment findings; the same
warning dominated the driver's BENCH_r04.json tail).  Keying the cache
directory by a fingerprint of the host's CPU feature set makes a foreign
artifact unreachable instead of a runtime hazard.

An explicit JAX_COMPILATION_CACHE_DIR env var wins — that is the operator
saying where the cache lives.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable hash of the machine features XLA:CPU AOT artifacts bake
    in: architecture + the CPU flag set (SIMD extensions etc.)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def cache_dir() -> str:
    """The compile-cache directory for this host (env override wins)."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    return f"/tmp/jax_cache_{host_fingerprint()}"


def setup_compilation_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point jax at the host-keyed persistent cache.  Returns the directory,
    or None when the runtime rejects the config (cache is an optimization
    only — never fail the caller)."""
    import jax

    path = cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:  # noqa: BLE001
        return None
    return path
