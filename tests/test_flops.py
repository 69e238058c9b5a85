"""Analytic custom-call FLOPs (profiling/flops.py) — the exact-MFU fix.

Pins the hand formula (7 matmuls x 2*B*H*Tq*Tk*D per flash site in
training) and that the accounting follows the model's OWN flash gate:
sites the gate rejects contribute zero because cost_analysis already
counts their XLA einsums.
"""

import pytest

from tethys_tpu import configs
from tethys_tpu.ops import attention as attn_mod
from tethys_tpu.profiling import flops as flops_lib


@pytest.fixture()
def force_flash(monkeypatch):
    # flash_active requires a TPU target; tests run on CPU, so take the
    # same escape hatch the CPU-mesh flash tests use.
    monkeypatch.setattr(attn_mod, "_FLASH_FORCE", True)


def _site(b, h, tq, tk, d, matmuls):
    return 2.0 * b * h * tq * tk * d * matmuls


def test_whisper_base_training_flops(force_flash):
    cfg = configs.WhisperConfig.from_size("base")
    b, label = 16, 100
    got = flops_lib.whisper_custom_call_flops(cfg, b, label_len=label)
    h = cfg.encoder_attention_heads
    d = cfg.d_model // h
    # encoder self (1500x1500) + decoder cross (100x1500) route to flash;
    # decoder self (100x100) fails the tk>=512 gate -> 0 here.
    want = (cfg.encoder_layers * _site(b, h, 1500, 1500, d, 7)
            + cfg.decoder_layers * _site(b, h, label, 1500, d, 7))
    assert got == pytest.approx(want, rel=1e-12)
    # Magnitude check: at whisper-base bench shapes this is a ~40% addition
    # to the ~3.9e12 HLO-visible step (BENCH_r04), not a rounding error.
    assert 1.0e12 < got < 2.5e12


def test_whole_loss_remat_adds_one_forward_replay(force_flash):
    cfg = configs.WhisperConfig.from_size("base")
    base = flops_lib.whisper_custom_call_flops(cfg, 4, label_len=100)
    remat = flops_lib.whisper_custom_call_flops(
        cfg, 4, label_len=100, whole_loss_remat=True)
    # 7 matmuls -> 9 (the 2 fwd matmuls replay once under jax.checkpoint).
    assert remat == pytest.approx(base * 9 / 7, rel=1e-12)


def test_eval_counts_forward_only(force_flash):
    cfg = configs.WhisperConfig.from_size("base")
    train = flops_lib.whisper_custom_call_flops(cfg, 4, label_len=100)
    ev = flops_lib.whisper_custom_call_flops(
        cfg, 4, label_len=100, training=False)
    assert ev == pytest.approx(train * 2 / 7, rel=1e-12)


def test_gate_off_means_zero(force_flash):
    cfg = configs.WhisperConfig.from_size("base", use_flash_attention=False)
    assert flops_lib.whisper_custom_call_flops(cfg, 16, label_len=100) == 0.0


def test_wav2vec2_short_clips_are_all_hlo(force_flash):
    cfg = configs.Wav2Vec2Config.from_size("base")
    frames = cfg.downsampled_length(32000)  # ~100 — under the flash gate
    assert frames < 512
    assert flops_lib.wav2vec2_custom_call_flops(cfg, 32, frames) == 0.0


def test_wav2vec2_long_clips_would_route_to_flash(force_flash):
    cfg = configs.Wav2Vec2Config.from_size(
        "base", **{})
    object.__setattr__(cfg, "use_flash_attention", True)  # hypothetical wiring
    frames = 1000  # ~30 s clips
    got = flops_lib.wav2vec2_custom_call_flops(cfg, 8, frames)
    h = cfg.num_attention_heads
    d = cfg.hidden_size // h
    want = cfg.num_hidden_layers * _site(8, h, frames, frames, d, 7)
    assert got == pytest.approx(want, rel=1e-12)
