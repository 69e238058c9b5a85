"""STFT -> log-mel audio frontend, bit-matching the TF reference math.

Reference (speech_jobs/whisper_dist.py:739-766): `tf.signal.stft`
(frame_length=400, frame_step=160, periodic Hann window, pad_end=False) ->
power spectrum -> `tf.signal.linear_to_mel_weight_matrix(80, 201, 16000,
0, 8000)` (HTK mel scale, DC bin zeroed) -> log(mel + 1e-6).

The mel matrix and window are computed in numpy once (compile-time
constants); the per-utterance compute is framing + rfft + two matmuls, which
XLA fuses tightly.  The fully fused single-kernel version (frame window +
matmul-DFT + power + mel + log without touching HBM in between) lives in
pallas_logmel.py.

Note a reference quirk (SURVEY quirk #11): its transcribe path feeds the
[frames, mels] output into the encoder without transposing to the expected
[B, n_mels, T] layout; `prepare_input_features` here does the
transpose + pad/trim to the model's 3000-frame window properly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hertz_to_mel(freq):
    """HTK mel scale (what tf.signal uses)."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def linear_to_mel_weight_matrix(
    num_mel_bins: int = 80,
    num_spectrogram_bins: int = 201,
    sample_rate: int = 16000,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
) -> np.ndarray:
    """[num_spectrogram_bins, num_mel_bins] float32, TF semantics
    (DC bin zeroed, triangular bands on the mel scale)."""
    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
    spectrogram_mels = hertz_to_mel(linear_freqs)[:, None]

    edges = np.linspace(
        hertz_to_mel(lower_edge_hertz), hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    lower = edges[:-2][None, :]
    center = edges[1:-1][None, :]
    upper = edges[2:][None, :]

    lower_slopes = (spectrogram_mels - lower) / (center - lower)
    upper_slopes = (upper - spectrogram_mels) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.pad(weights, [[bands_to_zero, 0], [0, 0]]).astype(np.float32)


@functools.lru_cache(maxsize=4)
def hann_window(length: int = 400) -> np.ndarray:
    """Periodic Hann window (tf.signal.hann_window default)."""
    n = np.arange(length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)).astype(np.float32)


def frame_signal(waveform: jax.Array, frame_length: int = 400,
                 frame_step: int = 160) -> jax.Array:
    """[..., T] -> [..., num_frames, frame_length], pad_end=False."""
    total = waveform.shape[-1]
    num_frames = 1 + (total - frame_length) // frame_step
    idx = (
        np.arange(num_frames)[:, None] * frame_step
        + np.arange(frame_length)[None, :]
    )
    return waveform[..., idx]


def extract_fbank_features(
    waveform: jax.Array,
    sample_rate: int = 16000,
    n_mels: int = 80,
    n_fft: int = 400,
    hop_length: int = 160,
) -> jax.Array:
    """[..., T] waveform -> [..., num_frames, n_mels] log-mel features,
    matching the reference extract_fbank_features (incl. sample_rate // 2
    upper edge and the log(x + 1e-6) floor)."""
    frames = frame_signal(waveform, n_fft, hop_length)
    windowed = frames * jnp.asarray(hann_window(n_fft))
    stft = jnp.fft.rfft(windowed.astype(jnp.float32), n=n_fft)
    power = jnp.square(jnp.abs(stft))

    num_bins = n_fft // 2 + 1
    mel_matrix = jnp.asarray(linear_to_mel_weight_matrix(
        n_mels, num_bins, sample_rate, 0.0, float(sample_rate // 2)))
    mel = jnp.tensordot(power, mel_matrix, axes=1)
    return jnp.log(mel + 1e-6)


def _use_fused_kernel() -> bool:
    """Fused pallas log-mel on TPU (TETHYS_FUSED_LOGMEL=0 disables); the
    XLA frontend stays the CPU/GPU fallback."""
    import os

    if os.environ.get("TETHYS_FUSED_LOGMEL", "1") == "0":
        return False
    from tethys_tpu.audio import pallas_logmel
    from tethys_tpu.utils.device import target_platform

    return pallas_logmel._INTERPRET or target_platform() == "tpu"


def log_mel_features(waveform: jax.Array, sample_rate: int = 16000,
                     n_mels: int = 80, n_fft: int = 400,
                     hop_length: int = 160) -> jax.Array:
    """[..., T] -> [..., F, n_mels]: the fused single-kernel path on TPU
    (audio/pallas_logmel.py — windowed DFT, power, mel, log in one pass),
    the XLA frontend elsewhere.  Same numerics contract (goldens in
    tests/test_audio.py).  The fused kernel handles 1-D/2-D waveforms;
    higher-rank inputs take the XLA path on every backend."""
    if waveform.ndim <= 2 and _use_fused_kernel():
        from tethys_tpu.audio.pallas_logmel import fused_log_mel

        return fused_log_mel(waveform, sample_rate, n_mels, n_fft, hop_length)
    return extract_fbank_features(waveform, sample_rate, n_mels, n_fft,
                                  hop_length)


def prepare_input_features(waveform: jax.Array, n_frames: int = 3000,
                           n_mels: int = 80) -> jax.Array:
    """Waveform [T] -> model input [1, n_mels, n_frames]: log-mel, transposed
    to the encoder layout and padded/trimmed to the 30 s frame budget (the
    transpose the reference transcribe path forgot)."""
    feats = log_mel_features(waveform, n_mels=n_mels)  # [F, n_mels]
    feats = feats.T                                    # [n_mels, F]
    f = feats.shape[-1]
    if f < n_frames:
        feats = jnp.pad(feats, ((0, 0), (0, n_frames - f)),
                        constant_values=float(np.log(1e-6)))
    else:
        feats = feats[:, :n_frames]
    return feats[None]


def stream_log_mel(waveform: jax.Array, sample_rate: int = 16000,
                   n_mels: int = 80, n_fft: int = 400,
                   hop_length: int = 160,
                   window_seconds: float = 30.0) -> jax.Array:
    """Arbitrary-length waveform [T] -> [n_windows, frames_per_window, n_mels]
    of 30 s log-mel windows — the STREAMING frontend of the BASELINE.json
    stretch config ("Whisper large-v3 ... with streaming fused log-mel
    frontend"; reference anchor: extract_fbank_features,
    speech_jobs/whisper_dist.py:739-766, which handles a single 30 s window).

    Seam policy: EXACT.  Window k covers monolithic STFT frames
    [k*F, (k+1)*F) (F = frames per 30 s window); each window's sample slice
    carries the (n_fft - hop_length)-sample lookahead past its nominal
    boundary, so every frame — including the seam-straddling ones — equals
    the frame a single whole-signal STFT would produce (test-pinned).  No
    overlap-add, no windowing tricks: frames never straddle INTO a window's
    slice that the monolithic framing wouldn't also read.

    The tail window is zero-padded to the full 30 s (whisper's own
    pad-to-30s semantic), so every window has identical static shape and
    one fused_log_mel compile serves any audio length.  All windows go
    through the kernel as ONE batch (TPU: the fused pallas kernel; else the
    XLA frontend)."""
    assert waveform.ndim == 1, "stream_log_mel takes a single [T] waveform"
    window_samples = int(round(window_seconds * sample_rate))  # 480000
    frames_per_window = window_samples // hop_length           # 3000
    lookahead = n_fft - hop_length                             # 240
    t = waveform.shape[0]
    n_windows = max(1, -(-t // window_samples))

    padded = jnp.pad(waveform.astype(jnp.float32),
                     (0, n_windows * window_samples + lookahead - t))
    # Static slices (starts are Python ints), not an index-matrix gather:
    # an [n_windows, 480240] int index tensor would cost ~460 MB for an
    # hour of audio and lower to a 57M-element gather; n_windows
    # lax.slice calls copy the same data with no index tensor at all.
    windows = jnp.stack([
        jax.lax.slice(padded, (k * window_samples,),
                      (k * window_samples + window_samples + lookahead,))
        for k in range(n_windows)
    ])                                      # [n_windows, 480240]
    return log_mel_features(windows, sample_rate, n_mels, n_fft, hop_length)


def prepare_streaming_features(waveform: jax.Array, n_mels: int = 80,
                               sample_rate: int = 16000,
                               window_seconds: float = 30.0) -> jax.Array:
    """Arbitrary-length waveform [T] -> encoder input batch
    [n_windows, n_mels, frames_per_window]: stream_log_mel + the encoder's
    [B, n_mels, T] layout.  Feed straight to the whisper encoder /
    greedy_generate as a batch of windows.  window_seconds defaults to
    whisper's 30 s; inference.transcribe_long_audio derives it from the
    model's n_ctx so non-standard contexts window correctly."""
    feats = stream_log_mel(waveform, sample_rate=sample_rate, n_mels=n_mels,
                           window_seconds=window_seconds)
    return jnp.swapaxes(feats, -1, -2)
