"""Audio frontend parity tests against tf.signal goldens."""

import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.audio import (
    extract_fbank_features,
    linear_to_mel_weight_matrix,
    prepare_input_features,
)
from tethys_tpu.audio import pallas_logmel


def test_mel_matrix_matches_tf():
    tf = pytest.importorskip("tensorflow")
    got = linear_to_mel_weight_matrix(80, 201, 16000, 0.0, 8000.0)
    want = tf.signal.linear_to_mel_weight_matrix(
        80, 201, 16000, 0.0, 8000.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_fbank_matches_tf_pipeline():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(16000).astype(np.float32)  # 1 s

    got = np.asarray(extract_fbank_features(jnp.asarray(wave)))

    stfts = tf.signal.stft(tf.constant(wave), frame_length=400,
                           frame_step=160, fft_length=400)
    power = tf.math.square(tf.abs(stfts))
    mel_matrix = tf.signal.linear_to_mel_weight_matrix(80, 201, 16000, 0, 8000)
    mel = tf.tensordot(power, mel_matrix, 1)
    want = tf.math.log(mel + 1e-6).numpy()

    assert got.shape == want.shape == (1 + (16000 - 400) // 160, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_prepare_input_features_layout():
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))
    feats = prepare_input_features(wave)
    assert feats.shape == (1, 80, 3000)  # padded to the 30 s frame budget
    short = prepare_input_features(wave, n_frames=100)
    assert short.shape == (1, 80, 100)  # trimmed


def test_fused_logmel_matches_frontend_interpret():
    """Pallas kernel (interpreter mode) vs the XLA frontend."""
    pallas_logmel._INTERPRET = True
    try:
        rng = np.random.default_rng(2)
        wave = jnp.asarray(
            rng.standard_normal((2, 16000)).astype(np.float32))
        got = np.asarray(pallas_logmel.fused_log_mel(wave))
        want = np.asarray(extract_fbank_features(wave))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    finally:
        pallas_logmel._INTERPRET = False


def test_transcribe_audio_tiny():
    """End-to-end transcription path on a tiny model (random weights)."""
    import jax
    from tethys_tpu.configs import WhisperConfig
    from tethys_tpu.models.whisper import WhisperForConditionalGeneration
    from tethys_tpu.inference import transcribe_audio

    config = WhisperConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=80, n_ctx=64, vocab_size=64, max_target_positions=16,
        decoder_start_token_id=60,
    )
    model = WhisperForConditionalGeneration(config)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    feats = jnp.zeros((1, 80, 128))
    labels = jnp.zeros((1, 4), dtype=jnp.int32)
    variables = {"params": model.init(
        {"params": rng, "dropout": rng}, feats, labels=labels,
        deterministic=True)["params"]}

    wave = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    ids = transcribe_audio(model, variables, wave, max_length=8)
    assert ids[0] == 60  # starts with decoder_start_token_id
    assert 1 <= len(ids) <= 9


def test_preprocess_text():
    from tethys_tpu.inference import preprocess_text

    class Tok:
        bos_token_id = 1
        eos_token_id = 2

        def encode(self, text):
            return [ord(c) % 50 + 3 for c in text]

    out = preprocess_text("ab", Tok())
    assert out[0] == 1 and out[-1] == 2 and len(out) == 4


def test_prepare_input_features_uses_fused_kernel_on_tpu(monkeypatch):
    """VERDICT r3 item 5: the inference feature path must route through the
    fused pallas kernel on TPU (interpret mode stands in here) and match
    the XLA frontend's output."""
    from tethys_tpu.audio import frontend

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    want = np.asarray(prepare_input_features(wave, n_frames=120))

    calls = []
    orig = pallas_logmel.fused_log_mel

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pallas_logmel, "_INTERPRET", True)
    monkeypatch.setattr(pallas_logmel, "fused_log_mel", spy)
    got = np.asarray(prepare_input_features(wave, n_frames=120))
    assert calls, "fused_log_mel was not used on the TPU path"
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # kill switch
    monkeypatch.setenv("TETHYS_FUSED_LOGMEL", "0")
    assert not frontend._use_fused_kernel()


def test_log_mel_features_high_rank_takes_xla_path(monkeypatch):
    """ndim>=3 waveforms must NOT be routed to the fused kernel (it handles
    1-D/2-D only — code-review finding, round 4): same API on every
    backend, via the XLA frontend."""
    from tethys_tpu.audio.frontend import log_mel_features

    rng = np.random.default_rng(5)
    wave = jnp.asarray(rng.standard_normal((2, 2, 8000)).astype(np.float32))

    def boom(*a, **k):
        raise AssertionError("fused path must not see ndim>=3 input")

    monkeypatch.setattr(pallas_logmel, "fused_log_mel", boom)
    monkeypatch.setattr(pallas_logmel, "_INTERPRET", True)  # "on TPU"
    out = log_mel_features(wave)
    want = extract_fbank_features(wave)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


def test_stream_log_mel_matches_monolithic_stft():
    """Streaming frontend seam policy is EXACT: a 125 s waveform chunked
    into five 30 s windows (overlap-carry slicing) produces bit-identical
    frames to ONE whole-signal STFT over the zero-padded 150 s signal —
    including the frames that straddle window seams."""
    from tethys_tpu.audio import extract_fbank_features, stream_log_mel

    rng = np.random.default_rng(0)
    t = 125 * 16000  # 2 min 5 s
    wave = jnp.asarray(rng.standard_normal(t).astype(np.float32))

    out = stream_log_mel(wave)                       # [5, 3000, 80]
    assert out.shape == (5, 3000, 80)

    padded = jnp.pad(wave, (0, 5 * 480000 + 240 - t))
    mono = extract_fbank_features(padded)            # [15000, 80]
    np.testing.assert_array_equal(
        np.asarray(out).reshape(15000, 80), np.asarray(mono))


def test_stream_log_mel_short_input_single_window():
    """Sub-30 s input yields one zero-padded window, equal to
    prepare_input_features' pad-to-30 s result in encoder layout."""
    from tethys_tpu.audio import prepare_streaming_features

    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.standard_normal(4 * 16000).astype(np.float32))
    out = prepare_streaming_features(wave)
    assert out.shape == (1, 80, 3000)
    ref = prepare_input_features(wave)
    # prepare_input_features pads FEATURES with log(1e-6); the streaming
    # path pads the WAVEFORM with zeros — identical on the frames the
    # 4 s signal actually covers.
    n_valid = (4 * 16000 - 400) // 160 + 1
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :n_valid], np.asarray(ref)[0, :, :n_valid],
        rtol=1e-6, atol=1e-6)


def test_stream_log_mel_large_v3_mel_bins():
    """n_mels=128 (large-v3) flows through the streaming frontend."""
    from tethys_tpu.audio import prepare_streaming_features

    wave = jnp.zeros(32 * 16000, jnp.float32)
    out = prepare_streaming_features(wave, n_mels=128)
    assert out.shape == (2, 128, 3000)


def test_transcribe_long_audio_tiny():
    """Streaming serving path end-to-end on a tiny model: a 3.3 s waveform
    with a 1.28 s model context (n_ctx=64) windows into 3 exact-seam
    chunks, decodes them as ONE batch, and returns per-window ids."""
    import jax
    from tethys_tpu.configs import WhisperConfig
    from tethys_tpu.models.whisper import WhisperForConditionalGeneration
    from tethys_tpu.inference import transcribe_long_audio

    config = WhisperConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=80, n_ctx=64, vocab_size=64, max_target_positions=16,
        decoder_start_token_id=60,
    )
    model = WhisperForConditionalGeneration(config)
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((1, 80, 128))
    variables = {"params": model.init(
        {"params": rng, "dropout": rng}, feats,
        labels=jnp.zeros((1, 4), dtype=jnp.int32),
        deterministic=True)["params"]}

    # window = n_ctx*2*160 = 20480 samples (1.28 s); 3.3 s -> 3 windows
    wave = np.random.default_rng(0).standard_normal(
        int(3.3 * 16000)).astype(np.float32)
    windows = transcribe_long_audio(model, variables, wave, max_length=8)
    assert len(windows) == 3
    for ids in windows:
        assert ids[0] == 60
        assert 1 <= len(ids) <= 9


def test_transcribe_long_audio_per_window_eos_trim(monkeypatch):
    """Each window's tokens are cut at its OWN first EOS (the global decode
    only stops when every window is done, so early-finishing windows carry
    post-EOS argmax noise), and the window batch is padded to a power-of-two
    bucket whose extra rows never leak into the result."""
    import jax
    import tethys_tpu.inference as inference
    from tethys_tpu.configs import WhisperConfig
    from tethys_tpu.models.whisper import WhisperForConditionalGeneration

    config = WhisperConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=80, n_ctx=64, vocab_size=64, max_target_positions=16,
        decoder_start_token_id=60,
    )
    model = WhisperForConditionalGeneration(config)

    captured = {}

    def fake_generate(model, variables, features, max_length=None):
        captured["batch"] = features.shape[0]
        toks = np.array([
            [60, 5, 2, 7, 7],     # EOS at step 2 -> trimmed to [60, 5]
            [60, 5, 6, 7, 2],     # EOS last -> [60, 5, 6, 7]
            [60, 1, 1, 1, 1],     # never finishes -> full decode length
            [60, 2, 0, 0, 0],     # bucket-padding row: must be dropped
        ], dtype=np.int32)
        return jnp.asarray(toks), jnp.asarray(5)

    monkeypatch.setattr(inference, "greedy_generate", fake_generate)
    wave = np.zeros(int(3.3 * 16000), dtype=np.float32)  # 3 windows
    windows = inference.transcribe_long_audio(model, {}, wave)
    assert captured["batch"] == 4  # 3 windows padded to the 4-bucket
    assert len(windows) == 3
    assert list(windows[0]) == [60, 5]
    assert list(windows[1]) == [60, 5, 6, 7]
    assert list(windows[2]) == [60, 1, 1, 1, 1]
