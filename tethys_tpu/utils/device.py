"""Device/platform helpers.

On tunneled TPU runtimes both compilation and *first execution* of a program
are minutes-slow, so tiny throwaway programs (model.init runs once on dummy
shapes) should run on host CPU.  `enable_host_cpu()` appends "cpu" to an
explicitly pinned platform list (e.g. JAX_PLATFORMS=axon) before backends
initialize; `host_cpu_context()` returns a context manager that makes the CPU
the default device if one is available.
"""

from __future__ import annotations

import contextlib


def enable_host_cpu() -> None:
    """Append cpu to jax_platforms when a specific platform is pinned.

    Must run before the first backend query.  No-op on auto-detection
    (cpu is always registered there) or when already present.
    """
    try:
        import jax

        current = jax.config.jax_platforms
        if current and "cpu" not in current.split(","):
            jax.config.update("jax_platforms", current + ",cpu")
    except Exception:  # noqa: BLE001 — an unavailable knob must not kill jobs
        pass


def target_platform() -> str:
    """Platform that jit-traced computations will actually lower to.

    Unlike bare `jax.default_backend()`, this respects an active
    `jax.default_device(...)` context — kernels gated on "tpu" must not take
    the pallas path when tracing for a host-CPU execution.
    """
    try:
        import jax

        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", None):
            return dev.platform
        return jax.default_backend()
    except Exception:  # noqa: BLE001
        return "cpu"


@contextlib.contextmanager
def host_cpu_context():
    """Context manager running enclosed computations on THIS host's CPU.

    Must be a local device: `jax.devices("cpu")[0]` is the GLOBAL device
    list, whose first entry belongs to process 0 — on a multi-process
    cluster every other process would set a non-addressable default device
    and crash in the first traced init (found by the 4-process jobs-entry
    test; would equally bite real multi-host pods).

    The persistent compilation cache is DISABLED inside the context when a
    non-CPU backend is present: on remote-compile runtimes (axon) even CPU
    programs are compiled by the remote service, whose XLA:CPU AOT
    artifacts bake the COMPILE machine's features — loading one on this
    host triggers cpu_aot_loader machine-feature errors ("could lead to
    execution errors such as SIGILL") and ~500 s re-verify stalls.  No
    host-side cache key can fix that (the mismatch is remote-compiler vs
    local host), so CPU-context programs are simply never persisted; they
    are one-shot inits whose fresh compiles cost seconds."""
    try:
        import jax

        cpu = jax.local_devices(backend="cpu")[0]
        remote_runtime = jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        yield
        return
    prev = None
    if remote_runtime:
        try:
            prev = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:  # noqa: BLE001 — cache knob absence must not kill
            prev = None
    try:
        with jax.default_device(cpu):
            yield
    finally:
        if prev is not None:
            try:
                jax.config.update("jax_enable_compilation_cache", prev)
            except Exception:  # noqa: BLE001
                pass
