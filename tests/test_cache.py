"""Host-fingerprinted compile-cache directory (utils/cache.py).

Guards the BASELINE.md round-3 failure mode: /tmp/jax_cache holding XLA:CPU
AOT artifacts from a DIFFERENT host (machine-feature mismatch warnings,
~500 s stalls).  The dir must be keyed by this host's CPU features unless
the operator sets JAX_COMPILATION_CACHE_DIR explicitly.
"""

import re

from tethys_tpu.utils import cache


def test_fingerprint_stable_and_short():
    a, b = cache.host_fingerprint(), cache.host_fingerprint()
    assert a == b
    assert re.fullmatch(r"[0-9a-f]{12}", a)


def test_cache_dir_keyed_by_host(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    d = cache.cache_dir()
    assert d == f"/tmp/jax_cache_{cache.host_fingerprint()}"
    assert d != "/tmp/jax_cache"  # the shared, cross-host-hazard path


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/custom_cache")
    assert cache.cache_dir() == "/tmp/custom_cache"


def test_setup_points_jax_at_host_dir(monkeypatch):
    import jax

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    path = cache.setup_compilation_cache()
    assert path == cache.cache_dir()
    assert jax.config.jax_compilation_cache_dir == path


def test_host_cpu_context_disables_persistence_on_remote_runtime(monkeypatch):
    """On remote-compile runtimes even CPU programs are compiled by the
    remote service, so their AOT artifacts bake the WRONG machine features
    — host_cpu_context must not persist them (and must restore the flag)."""
    import jax

    from tethys_tpu.utils import device

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert jax.config.jax_enable_compilation_cache
    with device.host_cpu_context():
        assert not jax.config.jax_enable_compilation_cache
    assert jax.config.jax_enable_compilation_cache


def test_host_cpu_context_keeps_cache_on_pure_cpu():
    """Pure-CPU processes compile locally — artifacts match the host, and
    the test/CI cache should keep working."""
    import jax

    from tethys_tpu.utils import device

    with device.host_cpu_context():
        assert jax.config.jax_enable_compilation_cache
