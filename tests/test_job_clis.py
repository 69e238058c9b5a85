"""Job CLI wiring smoke tests (argparse contracts, no training)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("jobs/whisper_dist.py", ["--num_batches", "--batch_size"]),
    ("jobs/whisper_single.py", ["--num_batches", "--batch_size"]),
    ("jobs/wav2vec2_single.py",
     ["--model_size", "--model_type", "--learning_rate", "--num_epochs"]),
    ("jobs/wav2vec2_dist.py", ["--model_size"]),
    ("jobs/whisper_dist_tensorsize.py", ["--log_tensor_freq"]),
    ("jobs/wav2vec2_dist_tensorsize.py", ["--model_size", "--log_tensor_freq"]),
    ("jobs/stable/whisper_dist.py", ["--num_batches"]),
    ("jobs/stable/wav2vec2_dist.py", ["--num_batches"]),
]


@pytest.mark.parametrize("script,flags", JOBS)
def test_cli_help_exposes_reference_flags(script, flags):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-500:]
    for flag in flags:
        assert flag in out.stdout, f"{script} missing {flag}"


def test_invalid_model_size_rejected():
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs/wav2vec2_dist.py"),
         "--model_size", "huge"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert out.returncode != 0
    assert "invalid choice" in out.stderr
