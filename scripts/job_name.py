"""Print `<task_type>_<index>` for log/artifact naming.

Equivalent of reference job_name.py:1-15: TF_CONFIG when present (Kubeflow),
else the JAX process index, else `worker_0`.
"""

import json
import os

tf_config = json.loads(os.environ.get("TF_CONFIG") or "{}")
task = tf_config.get("task", {})
job_name = task.get("type")
task_index = task.get("index")

if not tf_config:
    job_name = "worker"
    try:
        import jax

        task_index = jax.process_index()
    except Exception:  # noqa: BLE001 — naming must work without a backend
        task_index = 0

print(f"{job_name}_{task_index}")
