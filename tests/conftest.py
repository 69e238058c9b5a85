"""Test harness: 8 fake CPU devices so shard_map DP paths run without TPUs.

This replaces the reference's "no TF_CONFIG ⇒ single worker" degradation
trick (SURVEY §4) with a real 8-way mesh simulated on host CPU.
"""

import os

# Force CPU even when the parent environment pins a TPU platform
# (e.g. JAX_PLATFORMS=axon, where a sitecustomize pre-imports jax, so the
# env var alone is too late — use jax.config.update before backend init).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session", autouse=True)
def _verify_devices():
    assert jax.device_count() >= 8, (
        "test mesh requires 8 simulated CPU devices; got "
        f"{jax.device_count()}"
    )


@pytest.fixture(autouse=True)
def _isolated_artifacts(tmp_path, monkeypatch):
    """Point the /workspace //result contracts at a tmpdir."""
    ws = tmp_path / "workspace"
    res = tmp_path / "result"
    ws.mkdir()
    res.mkdir()
    monkeypatch.setenv("TETHYS_WORKSPACE", str(ws))
    monkeypatch.setenv("TETHYS_RESULT", str(res))
    yield
