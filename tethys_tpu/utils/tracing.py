"""Optional jax.profiler tracing (SURVEY §5.1 superset of the reference's
per-step timing): `--jax_profile DIR` on jobs wraps training in a profiler
trace viewable in TensorBoard/XProf.  Guarded — tunneled TPU runtimes may not
support trace collection, and profiling must never kill a job.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_profiler_trace(log_dir):
    if not log_dir:
        yield
        return
    try:
        import jax

        ctx = jax.profiler.trace(log_dir)
    except Exception as e:  # noqa: BLE001
        print(f"jax.profiler unavailable: {e}")
        yield
        return
    try:
        with ctx:
            yield
        print(f"jax.profiler trace written to {log_dir}")
    except Exception as e:  # noqa: BLE001
        print(f"jax.profiler trace failed: {e}")
