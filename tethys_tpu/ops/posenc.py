"""Positional encodings.

Sinusoidal table matching the reference `PositionalEncoding`
(reference speech_jobs/whisper_dist.py:49-69): interleaved sin/cos with the
exp/log frequency formulation.  Also provides the trainable
sin/cos-initialized relative table from the reference Wav2Vec2 file
(reference speech_jobs/wav2vec2_dist.py:200-223; defined there but never wired
into the model path — we keep the same status and expose it as a utility).
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] float32 table; even dims sin, odd dims cos."""
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    position = np.arange(0, max_len)[:, np.newaxis]
    div_term = np.exp(np.arange(0, d_model, 2) * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class SinusoidalPositionalEncoding(nn.Module):
    """Adds a fixed sinusoidal table (non-trainable constant folded by XLA)."""

    d_model: int
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))

    def __call__(self, x: jax.Array) -> jax.Array:
        seq_len = x.shape[1]
        return x + self.pe[None, :seq_len, :].astype(self.dtype)


def relative_position_table(max_length: int, d_model: int) -> np.ndarray:
    """Sin/cos-initialized table for the (unused-in-reference) trainable
    relative positional embedding; per-position loop semantics of the
    reference replaced by the equivalent vectorized computation."""
    pos = np.arange(max_length)[:, None].astype(np.float64)
    i = np.arange(0, d_model, 2).astype(np.float64)
    angles = pos / (10000.0 ** (i / d_model))
    table = np.zeros((max_length, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(angles)
    table[:, 1::2] = np.cos(angles[:, : table[:, 1::2].shape[1]])
    return table.astype(np.float32)


class RelativePositionalEncoding(nn.Module):
    """Trainable position table initialized with sin/cos values.

    Parity note: the reference defines this layer but never calls it from any
    model (reference speech_jobs/wav2vec2_dist.py:200-223); it is provided for
    inventory completeness.
    """

    dim: int
    max_length: int = 5000

    @nn.compact
    def __call__(self, length: int) -> jax.Array:
        table = self.param(
            "pos_embedding",
            lambda key, shape: jnp.asarray(
                relative_position_table(self.max_length, self.dim)
            ),
            (self.max_length, self.dim),
        )
        return table[:length]
