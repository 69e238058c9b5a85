"""Fused window-DFT -> power -> mel -> log Pallas kernel.

The XLA reference path materializes three HBM intermediates per utterance
(complex STFT, power spectrum, mel energies) between four kernels; here the
framing gather stays in XLA (it is a cheap strided copy) and everything after
it — windowing folded into a real DFT as two MXU matmuls (cos/sin matrices
pre-scaled by the periodic Hann window), power, mel projection, log floor —
runs as ONE Pallas kernel per 128-frame block: frames go in, [B, F, 80]
log-mel comes out, nothing else touches HBM.

The DFT-as-matmul trick replaces the FFT (which Pallas cannot express) with
[128, 512] @ [512, 201] matmuls — at frame length 400 that is ~2x the FLOPs
of an FFT but rides the MXU.  Numerically identical to
frontend.extract_fbank_features (same window, mel matrix, epsilon).

(An earlier revision DMA'd the raw waveform and assembled the overlapped
frames in-kernel; Mosaic's tile-alignment rules for strided slices at
hop=160 made that a dead end — the framing gather costs ~0.1 ms of HBM
bandwidth at 16x30 s, so it is not worth fighting.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tethys_tpu.audio.frontend import (
    frame_signal,
    hann_window,
    linear_to_mel_weight_matrix,
)

FRAME_BLOCK = 128
_INTERPRET = False


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int = 400, pad_to: int = 512):
    """Window-folded real-DFT matrices padded to a 128-aligned frame length:
    C[n, k] = w[n] cos(-2 pi n k / N), zero rows beyond n_fft."""
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft).astype(np.float64)[:, None]
    cos_m = np.zeros((pad_to, n_fft // 2 + 1), dtype=np.float32)
    sin_m = np.zeros((pad_to, n_fft // 2 + 1), dtype=np.float32)
    cos_m[:n_fft] = (w * np.cos(ang)).astype(np.float32)
    sin_m[:n_fft] = (w * np.sin(ang)).astype(np.float32)
    return cos_m, sin_m


def _precise_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16x3 split-precision matmul: the v5e MXU rounds f32 operands to
    bf16, which wrecks the log of near-zero mel bins; splitting both
    operands into bf16 high + residual parts recovers ~f32 accuracy at 3x
    the (trivial) FLOPs."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    frames = frames_ref[0]              # [128, 512] (zero-padded past 400)
    re = _precise_dot(frames, cos_ref[:])
    im = _precise_dot(frames, sin_ref[:])
    power = re * re + im * im           # [128, 201]
    mel = _precise_dot(power, mel_ref[:])
    out_ref[0] = jnp.log(mel + 1e-6)


def fused_log_mel(
    waveform: jax.Array,               # [B, T] float32
    sample_rate: int = 16000,
    n_mels: int = 80,
    n_fft: int = 400,
    hop_length: int = 160,
) -> jax.Array:
    """[B, T] -> [B, num_frames, n_mels] log-mel via one fused kernel."""
    if waveform.ndim == 1:
        return fused_log_mel(waveform[None], sample_rate, n_mels, n_fft,
                             hop_length)[0]
    b = waveform.shape[0]
    frames = frame_signal(waveform.astype(jnp.float32), n_fft, hop_length)
    num_frames = frames.shape[1]
    frames_pad = -(-num_frames // FRAME_BLOCK) * FRAME_BLOCK
    pad_to = -(-n_fft // 128) * 128
    frames = jnp.pad(
        frames, ((0, 0), (0, frames_pad - num_frames), (0, pad_to - n_fft)))

    cos_m, sin_m = _dft_matrices(n_fft, pad_to)
    num_bins = n_fft // 2 + 1
    mel_m = linear_to_mel_weight_matrix(
        n_mels, num_bins, sample_rate, 0.0, float(sample_rate // 2))

    out = pl.pallas_call(
        _kernel,
        grid=(b, frames_pad // FRAME_BLOCK),
        in_specs=[
            pl.BlockSpec((1, FRAME_BLOCK, pad_to), lambda b, i: (b, i, 0)),
            pl.BlockSpec((pad_to, num_bins), lambda b, i: (0, 0)),
            pl.BlockSpec((pad_to, num_bins), lambda b, i: (0, 0)),
            pl.BlockSpec((num_bins, n_mels), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, n_mels),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, frames_pad, n_mels), jnp.float32),
        interpret=_INTERPRET,
    )(frames, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel_m))
    return out[:, :num_frames, :]
