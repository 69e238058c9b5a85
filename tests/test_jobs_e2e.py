"""End-to-end smoke tests: tiny configs, 8-way DP mesh, full contracts.

The TPU analogue of the reference's "does the job run N steps and print a
decreasing-ish loss" verification (SURVEY §4), plus log-line / JCT / ckpt
contract checks the reference never had.
"""

import os
import re

import numpy as np
import pytest

from tethys_tpu.parallel.mesh import make_data_mesh
from tethys_tpu.train import jobs
from tethys_tpu.utils.artifacts import write_jct

TINY_WHISPER = dict(
    d_model=32, encoder_layers=1, encoder_attention_heads=2,
    decoder_layers=1, decoder_attention_heads=2, d_ff=64,
    n_mels=8, n_ctx=64, vocab_size=128, max_target_positions=128,
    decoder_start_token_id=101,
)

TINY_W2V2 = dict(
    hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
    num_codevectors_per_group=12, num_codevector_groups=2,
    codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
    classifier_proj_size=16,
)

LOG_RE = re.compile(
    r"Step \d+, Loss: -?\d+\.\d{4}, Time: \d{2}:\d{2}:\d{2} "
    r"\(경과: \d+\.\d{2}초, 스텝 시간: \d+\.\d{2}초\)"
)


def test_whisper_job_e2e(tmp_path, capsys):
    mesh = make_data_mesh(8)
    result, model, config = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=1,
        num_batches=3,
        mesh=mesh,
        checkpoint_dir=str(tmp_path / "ckpt"),
        data_seq_len=128,
        config_overrides=TINY_WHISPER,
    )
    out = capsys.readouterr().out
    assert "Epoch 1/1" in out
    assert len(LOG_RE.findall(out)) == 3
    assert result.total_steps == 3
    assert all(np.isfinite(result.losses))
    # epoch checkpoint saved
    assert any("whisper_small_epoch_1" in d
               for d in os.listdir(tmp_path / "ckpt"))


@pytest.mark.parametrize("model_type", ["pretraining", "asr", "classification"])
def test_wav2vec2_job_e2e(tmp_path, model_type):
    mesh = make_data_mesh(8)
    result, model, config = jobs.train_wav2vec2(
        model_type=model_type,
        model_size="small",
        batch_size_per_replica=1,
        num_batches=2,
        mesh=mesh,
        checkpoint_dir=str(tmp_path / "ckpt"),
        audio_length=1600,
        config_overrides=TINY_W2V2,
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))


def test_wav2vec2_loss_decreases(tmp_path):
    """Loss trend sanity over a few steps (fixed data, lr bumped)."""
    mesh = make_data_mesh(1)
    result, _, _ = jobs.train_wav2vec2(
        model_type="classification",
        batch_size_per_replica=4,
        num_batches=8,
        learning_rate=3e-3,
        mesh=mesh,
        checkpointing=False,
        audio_length=1600,
        config_overrides=TINY_W2V2,
    )
    assert result.losses[-1] < result.losses[0]


def test_jct_contract(tmp_path, monkeypatch):
    ws = os.environ["TETHYS_WORKSPACE"]
    res = os.environ["TETHYS_RESULT"]
    with open(os.path.join(ws, "model.txt"), "w") as f:
        f.write("whisper-job\n")
    os.makedirs(os.path.join(res, "whisper-job"), exist_ok=True)
    path = write_jct(12.3456, "worker", 0)
    assert path.endswith("whisper-job/worker_0_jct.txt")
    with open(path) as f:
        assert f.read() == "12.35"
    single = write_jct(7.0, None, None, single=True)
    assert single.endswith("whisper-job/single_jct.txt")


def test_jct_missing_volume_is_swallowed(monkeypatch):
    monkeypatch.setenv("TETHYS_WORKSPACE", "/nonexistent-ws")
    assert write_jct(1.0, "worker", 0) is None


def test_whisper_profiled_job(tmp_path):
    from tethys_tpu.profiling import TensorProfiler

    mesh = make_data_mesh(2)
    prof = TensorProfiler(log_dir=str(tmp_path / "tl"),
                          model_name="whisper_small", flavor="whisper")
    result, _, _ = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=1,
        num_batches=2,
        mesh=mesh,
        checkpointing=False,
        data_seq_len=128,
        config_overrides=TINY_WHISPER,
        profiler=prof,
    )
    summary = prof.save_final_results()
    prof.close()
    assert summary["total_steps"] == 2
    assert summary["tiresias_tensorsize_mb"] > 0
    # census covers all four categories
    types = {d["tensor_type"] for d in prof.tensor_details}
    assert {"input", "activation", "output", "gradient", "parameter"} <= types
    assert (tmp_path / "tl" / "tiresias_tensorsize.txt").exists()


def test_wav2vec2_profiled_job_value_skews(tmp_path):
    from tethys_tpu.profiling import TensorProfiler

    mesh = make_data_mesh(2)
    prof = TensorProfiler(log_dir=str(tmp_path / "tl"),
                          model_name="wav2vec2_small", flavor="wav2vec2")
    result, _, _ = jobs.train_wav2vec2(
        model_type="pretraining",
        batch_size_per_replica=1,
        num_batches=2,
        mesh=mesh,
        checkpointing=False,
        audio_length=1600,
        config_overrides=TINY_W2V2,
        profiler=prof,
    )
    summary = prof.save_final_results()
    prof.close()
    skews = summary["skewness_analysis"].get("value_skewness", {})
    assert any(k.startswith("gradient/") for k in skews)
    assert "input/input_values" in skews
    assert any(k.startswith("output/") for k in skews)
    assert all(np.isfinite(v) for v in skews.values())


def test_whisper_job_seq_parallel(tmp_path, capsys):
    """--sp path: (data, seq) mesh, encoder time axis sharded (extension)."""
    from tethys_tpu.parallel import sp as sp_lib

    mesh = sp_lib.make_seq_mesh(8, seq_parallel=4)
    result, _, _ = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=1,
        num_batches=2,
        mesh=mesh,
        seq_parallel=4,
        checkpointing=False,
        data_seq_len=128,
        config_overrides=TINY_WHISPER,
    )
    out = capsys.readouterr().out
    assert len(LOG_RE.findall(out)) == 2
    assert all(np.isfinite(result.losses))


def test_collective_report_written(tmp_path):
    """Dist jobs write <task>_<idx>_collectives.txt with nonzero all-reduce
    bytes (the analytic ICI equivalent of reference network.sh:1-9)."""
    ws = os.environ["TETHYS_WORKSPACE"]
    res = os.environ["TETHYS_RESULT"]
    with open(os.path.join(ws, "model.txt"), "w") as f:
        f.write("whisper-coll\n")
    out_dir = os.path.join(res, "whisper-coll")
    os.makedirs(out_dir, exist_ok=True)
    mesh = make_data_mesh(8)
    jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=1,
        num_batches=1,
        mesh=mesh,
        checkpointing=False,
        data_seq_len=128,
        config_overrides=TINY_WHISPER,
        collective_report=True,
    )
    path = os.path.join(out_dir, "worker_0_collectives.txt")
    assert os.path.exists(path)
    lines = open(path).read().splitlines()
    ar = [ln for ln in lines if ln.startswith("all-reduce,")]
    assert ar, lines
    assert int(ar[0].split(",")[1]) > 0
    total = [ln for ln in lines if ln.startswith("total,")]
    assert total and int(total[0].split(",")[1]) > 0


def test_resume_flag_restores_latest(tmp_path, capsys):
    """Train 2 steps, then rerun with resume=True — must load the epoch ckpt."""
    mesh = make_data_mesh(2)
    common = dict(
        model_type="classification",
        batch_size_per_replica=1,
        num_batches=2,
        mesh=mesh,
        checkpoint_dir=str(tmp_path / "ck"),
        audio_length=1600,
        config_overrides=TINY_W2V2,
    )
    jobs.train_wav2vec2(**common)
    capsys.readouterr()
    jobs.train_wav2vec2(**common, resume=True)
    out = capsys.readouterr().out
    assert "Resumed from checkpoint model_epoch_1" in out


def test_whisper_job_capacity_mode(tmp_path, capsys):
    """The single-chip capacity combo — remat_layers + bf16 master +
    grad_accum — runs end-to-end through train_whisper with finite,
    moving loss (the config medium/large jobs use, at tiny shapes)."""
    mesh = make_data_mesh(8)
    overrides = dict(TINY_WHISPER, remat_layers=True)
    result, model, config = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=2,
        num_batches=3,
        mesh=mesh,
        checkpointing=False,
        data_seq_len=128,
        config_overrides=overrides,
        grad_accum=2,
        master_dtype="bfloat16",
    )
    out = capsys.readouterr().out
    assert len(LOG_RE.findall(out)) == 3
    assert all(np.isfinite(result.losses))
    assert result.losses[-1] != result.losses[0]
