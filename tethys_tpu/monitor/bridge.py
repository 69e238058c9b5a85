"""Runtime-side metrics publisher for the TPU monitor daemon.

libtpu has no NVML-style out-of-band utilization API, so the counters the
C++ daemon samples must come from inside the runtime: this bridge runs a
daemon thread in the training process that periodically writes per-device

    idx|name|util_percent|mem_util_percent|mem_bytes

lines (atomic write-to-temp + rename) to the metrics file the daemon reads
(`$TETHYS_TPU_METRICS`, default /tmp/tethys_tpu_metrics).

* **HBM usage** comes from `device.memory_stats()` (`bytes_in_use` /
  `bytes_limit`), the libtpu allocator's own counters.
* **Utilization** is a HOST-SIDE step duty-cycle over a sliding window: the
  training loop reports each step's host wall duration via `note_step()`
  (wired as a run_training step hook); util% = busy_time / wall_time.  This
  is the closest stand-in for NVML's "GPU Util" available without a device
  counter API, but it is NOT a device-busy measurement: the host duration
  includes dispatch and data prep, so back-to-back steps report ~100% even
  when the chip idles between launches.  An idle process (no recent steps)
  reports 0%.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time
from typing import List, Optional, Tuple


def metrics_path() -> str:
    return os.environ.get("TETHYS_TPU_METRICS", "/tmp/tethys_tpu_metrics")


class MonitorBridge:
    def __init__(self, path: Optional[str] = None, interval_s: float = 0.1,
                 window_s: float = 2.0):
        self.path = path or metrics_path()
        self.interval_s = interval_s
        self.window_s = window_s
        self._busy: List[Tuple[float, float]] = []  # (end_time, duration)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- training-loop side --------------------------------------------

    def note_step(self, step: int, loss: float, duration: float,
                  aux=None) -> None:
        """run_training step hook: record a host step duration."""
        del step, loss, aux
        with self._lock:
            now = time.time()
            self._busy.append((now, duration))
            cutoff = now - self.window_s
            self._busy = [(t, d) for t, d in self._busy if t >= cutoff]

    def _utilization_percent(self) -> int:
        """Host duty-cycle over the sliding window.  Stale entries are
        pruned HERE too (not just in note_step) so a process that stops
        stepping decays to 0% instead of freezing at the last value."""
        with self._lock:
            cutoff = time.time() - self.window_s
            self._busy = [(t, d) for t, d in self._busy if t >= cutoff]
            if not self._busy:
                return 0
            busy = sum(d for _, d in self._busy)
        return max(0, min(100, int(round(100.0 * busy / self.window_s))))

    # -- publisher ------------------------------------------------------

    def _device_lines(self) -> List[str]:
        import jax

        util = self._utilization_percent()
        lines = []
        for i, dev in enumerate(jax.local_devices()):
            mem_bytes = 0
            mem_util = 0
            try:
                stats = dev.memory_stats() or {}
                mem_bytes = int(stats.get("bytes_in_use", 0))
                limit = int(stats.get("bytes_limit", 0))
                if limit > 0:
                    mem_util = int(round(100.0 * mem_bytes / limit))
            except Exception:  # noqa: BLE001 — not all runtimes expose stats
                pass
            name = getattr(dev, "device_kind", "TPU").replace("|", "/")
            lines.append(f"{i}|{name}|{util}|{mem_util}|{mem_bytes}")
        return lines

    def publish_once(self) -> None:
        lines = self._device_lines()
        directory = os.path.dirname(self.path) or "."
        os.makedirs(directory, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tpu_metrics_")
        try:
            with os.fdopen(fd, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(tmp, self.path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.publish_once()
            except Exception as e:  # noqa: BLE001 — monitor must never kill training
                print(f"monitor bridge error: {e}")

    def start(self) -> "MonitorBridge":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._run, name="tethys-monitor-bridge", daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
