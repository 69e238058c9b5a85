"""Monitor bridge + native daemon tests."""

import os
import shutil
import subprocess
import time

import pytest

from tethys_tpu.monitor.bridge import MonitorBridge


def test_bridge_publishes_metrics(tmp_path):
    path = str(tmp_path / "metrics")
    bridge = MonitorBridge(path=path, interval_s=0.02, window_s=2.0)
    bridge.note_step(0, 1.0, 1.0)  # 1 s busy in a 2 s window -> 50%
    bridge.publish_once()
    content = open(path).read().strip().splitlines()
    assert len(content) >= 1
    idx, name, util, mem_util, mem_bytes = content[0].split("|")
    assert idx == "0"
    assert util == "50"
    assert int(mem_bytes) >= 0


def test_bridge_window_expiry(tmp_path):
    bridge = MonitorBridge(path=str(tmp_path / "m"), window_s=0.1)
    bridge.note_step(0, 1.0, 0.05)
    time.sleep(0.2)
    bridge.note_step(1, 1.0, 0.0)  # triggers pruning
    assert bridge._utilization_percent() == 0


def test_bridge_idle_decays_to_zero(tmp_path):
    """VERDICT r2 item 9: a process that stops stepping must report ~0%
    util — the read path prunes stale entries itself, without waiting for
    another note_step call."""
    bridge = MonitorBridge(path=str(tmp_path / "m"), window_s=0.1)
    bridge.note_step(0, 1.0, 0.09)
    assert bridge._utilization_percent() > 0
    time.sleep(0.2)  # go idle: NO further note_step
    assert bridge._utilization_percent() == 0


MONITOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tethys_tpu", "monitor",
)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_daemon_nvml_line_format(tmp_path):
    binary = os.path.join(MONITOR_DIR, "tpu_monitor")
    if not os.path.exists(binary):
        subprocess.run(["make", "-C", MONITOR_DIR], check=True,
                       capture_output=True)
    metrics = tmp_path / "metrics"
    metrics.write_text("0|TPU v5e|87|41|6871947673\n")
    # run briefly and terminate (daemon loops forever)
    proc = subprocess.Popen([binary, str(metrics)], stdout=subprocess.PIPE,
                            text=True)
    time.sleep(0.5)
    proc.terminate()
    stdout, _ = proc.communicate(timeout=5)
    lines = [l for l in stdout.splitlines() if l.strip()]
    assert lines, "daemon produced no output"
    first = lines[0].strip()
    # NVML-format contract: "H:M:S:ms  Device 0: <name>  GPU Util: u  Mem Util: m Mem Usage: b"
    assert "Device 0: TPU v5e" in first
    assert "GPU Util: 87" in first
    assert "Mem Util: 41" in first
    assert "Mem Usage: 6871947673" in first
