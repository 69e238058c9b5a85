"""Distributed-context plumbing tests (TF_CONFIG compatibility)."""

import json

from tethys_tpu.parallel.mesh import (
    cluster_spec_from_tf_config,
    job_identity,
    job_name,
    make_data_mesh,
    num_replicas,
)


def test_cluster_spec_chief_plus_worker():
    cfg = {
        "cluster": {"chief": ["chief-0:2222"], "worker": ["worker-0:2222"]},
        "task": {"type": "worker", "index": 0},
    }
    spec = cluster_spec_from_tf_config(cfg)
    # chief is process 0; this worker is process 1; coordinator = chief
    assert spec == ("chief-0:2222", 2, 1)

    cfg["task"] = {"type": "chief", "index": 0}
    assert cluster_spec_from_tf_config(cfg) == ("chief-0:2222", 2, 0)


def test_cluster_spec_workers_only():
    cfg = {
        "cluster": {"worker": [f"w{i}:2222" for i in range(4)]},
        "task": {"type": "worker", "index": 2},
    }
    assert cluster_spec_from_tf_config(cfg) == ("w0:2222", 4, 2)


def test_cluster_spec_single_process():
    assert cluster_spec_from_tf_config({}) is None
    assert cluster_spec_from_tf_config(
        {"cluster": {"worker": ["w0:2222"]}, "task": {}}) is None


def test_job_identity_from_tf_config(monkeypatch):
    monkeypatch.setenv("TF_CONFIG", json.dumps(
        {"cluster": {"worker": ["a", "b"]},
         "task": {"type": "worker", "index": 1}}))
    assert job_identity() == ("worker", 1)
    assert job_name() == "worker_1"


def test_job_identity_without_tf_config(monkeypatch):
    monkeypatch.delenv("TF_CONFIG", raising=False)
    task_type, task_index = job_identity()
    assert task_type == "worker"
    assert task_index == 0  # single-process test run


def test_job_identity_malformed_tf_config(monkeypatch):
    monkeypatch.setenv("TF_CONFIG", "{not json")
    assert job_identity() == ("worker", 0)


def test_mesh_shapes():
    mesh = make_data_mesh()
    assert num_replicas(mesh) == 8
    mesh2 = make_data_mesh(4)
    assert num_replicas(mesh2) == 4
