"""Runtime-side metrics publisher for the TPU monitor daemon.

libtpu has no NVML-style out-of-band utilization API, so the counters the
C++ daemon samples must come from inside the runtime: this bridge runs a
daemon thread in the training process that periodically writes per-device

    idx|name|util_percent|mem_util_percent|mem_bytes|host_duty_percent

lines (atomic write-to-temp + rename) to the metrics file the daemon reads
(`$TETHYS_TPU_METRICS`, default /tmp/tethys_tpu_metrics).  The daemon's
parser reads the first five fields (reference NVML line contract,
NVML/NVML.cpp:47-79); the sixth is the host-side signal kept alongside for
debugging.

* **HBM usage** comes from `device.memory_stats()` (`bytes_in_use` /
  `bytes_limit`), the libtpu allocator's own counters.
* **Utilization** is DEVICE-DERIVED when possible: a queue probe.  TPU
  devices execute programs in order, so a tiny jitted no-op dispatched from
  the bridge thread completes immediately on an idle chip but queues behind
  the running train step on a busy one.  Each publish tick times one probe
  against an idle-latency baseline calibrated at start; utilization% =
  fraction of busy probes over the sliding window — the same
  sampling-counter shape as NVML's "GPU Util".  The probe costs the device
  ~µs of work per tick (~10 Hz) and blocks only the bridge thread.
* **Host duty-cycle fallback**: when the probe is unavailable (no device,
  calibration failure, TETHYS_DEVICE_PROBE=0) the util column falls back to
  the host step duty-cycle over the window, fed by `note_step()` (wired as a
  run_training step hook).  That signal reads ~100% whenever steps are
  back-to-back even if the chip idles between dispatches — which is exactly
  why the probe exists.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time
from typing import List, Optional, Tuple


def metrics_path() -> str:
    return os.environ.get("TETHYS_TPU_METRICS", "/tmp/tethys_tpu_metrics")


class DeviceQueueProbe:
    """Samples device busyness by timing a tiny dispatched program.

    Calibrates an idle-latency baseline at construction (the bridge starts
    before the first train step, so the device is idle); a later probe is
    "busy" when its completion latency clearly exceeds that baseline —
    i.e. the probe had to wait behind queued device work."""

    def __init__(self, device=None, n_calibrate: int = 7):
        import jax

        self._device = device if device is not None else jax.local_devices()[0]
        self._x = jax.device_put(0.0, self._device)
        self._fn = jax.jit(lambda x: x + 1.0)
        # A HOST FETCH, not block_until_ready: on async runtimes (incl. the
        # tunneled TPU plugin) block_until_ready can return before the
        # device executes; a value fetch cannot.
        float(self._fn(self._x))  # compile outside calibration
        samples = []
        for _ in range(n_calibrate):
            t0 = time.perf_counter()
            float(self._fn(self._x))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        self.baseline_s = samples[len(samples) // 2]
        # 4x the idle median, floored at +3 ms: robust both to local-chip
        # µs baselines and to multi-ms tunneled-runtime RTTs.
        self.threshold_s = max(4.0 * self.baseline_s, self.baseline_s + 3e-3)

    def sample_busy(self) -> bool:
        t0 = time.perf_counter()
        float(self._fn(self._x))
        dt = time.perf_counter() - t0
        # Self-correcting baseline: the true idle floor is the MINIMUM
        # latency ever observed.  A bridge started on an already-busy
        # device calibrates high (every probe would read "idle" forever);
        # the first genuinely idle probe pulls the baseline and threshold
        # back down.
        if dt < self.baseline_s:
            self.baseline_s = dt
            self.threshold_s = max(4.0 * dt, dt + 3e-3)
        return dt > self.threshold_s


class MonitorBridge:
    def __init__(self, path: Optional[str] = None, interval_s: float = 0.1,
                 window_s: float = 2.0, probe: Optional[object] = None):
        self.path = path or metrics_path()
        self.interval_s = interval_s
        self.window_s = window_s
        self._busy: List[Tuple[float, float]] = []  # (end_time, duration)
        # Probe sample windows keyed by local-device index; the key None is
        # the SHARED window used when a single probe object was injected
        # (tests) — its value is then published for every device line.
        self._probes: dict = {}  # key -> List[(time, busy)]
        self._probe_map: dict = {None: probe} if probe is not None else {}
        self._probe = probe  # injected single probe (tests) or None
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

    # -- device probe ----------------------------------------------------

    def _maybe_init_probe(self) -> None:
        if self._probe_map:
            return
        if os.environ.get("TETHYS_DEVICE_PROBE", "1") == "0":
            return
        # One probe PER local device: execution queues are per-chip, so a
        # single chip-0 probe published on every line would report wrong
        # utilization for chips 1..N-1 on multi-device hosts.
        try:
            import jax

            self._probe_map = {
                i: DeviceQueueProbe(dev)
                for i, dev in enumerate(jax.local_devices())
            }
        except Exception as e:  # noqa: BLE001 — fall back to host duty-cycle
            print(f"monitor device probe unavailable: {e}")
            self._probe_map = {}

    def probe_once(self) -> None:
        """Take one device-busy sample per probe into its sliding window."""
        for key, probe in list(self._probe_map.items()):
            try:
                busy = probe.sample_busy()
            except Exception:  # noqa: BLE001
                continue
            with self._lock:
                now = time.time()
                window = self._probes.setdefault(key, [])
                window.append((now, busy))
                cutoff = now - self.window_s
                self._probes[key] = [(t, b) for t, b in window if t >= cutoff]

    def _device_utilization_percent(self, idx: int = 0) -> Optional[int]:
        """Busy-probe fraction over device idx's window (falling back to
        the shared injected-probe window); None when no samples."""
        with self._lock:
            cutoff = time.time() - self.window_s
            window = self._probes.get(idx)
            if window is None:
                window = self._probes.get(None)
            if not window:
                return None
            window[:] = [(t, b) for t, b in window if t >= cutoff]
            if not window:
                return None
            busy = sum(1 for _, b in window if b)
            return int(round(100.0 * busy / len(window)))

    def _host_duty_percent(self) -> int:
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

    def _utilization_percent(self, idx: int = 0) -> int:
        device = self._device_utilization_percent(idx)
        return device if device is not None else self._host_duty_percent()

    # -- publisher ------------------------------------------------------

    def _device_lines(self) -> List[str]:
        import jax

        host_duty = self._host_duty_percent()
        lines = []
        for i, dev in enumerate(jax.local_devices()):
            util = self._utilization_percent(i)
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
            lines.append(f"{i}|{name}|{util}|{mem_util}|{mem_bytes}|{host_duty}")
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
                self.probe_once()
                self.publish_once()
            except Exception as e:  # noqa: BLE001 — monitor must never kill training
                print(f"monitor bridge error: {e}")

    def start(self) -> "MonitorBridge":
        if self._thread is None:
            self._maybe_init_probe()
            self._thread = threading.Thread(
                target=self._run, name="tethys-monitor-bridge", daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
