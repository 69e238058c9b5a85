"""Attention masks and SpecAugment-style time/feature masking.

* `causal_additive_mask` reproduces the decoder mask construction of the
  reference (`1 - band_part(ones, -1, 0)` then `(1-mask)*-1e9` inside
  attention — reference speech_jobs/whisper_dist.py:414-418, 150-154), fused
  here into one additive bias computed at trace time (static shapes, so XLA
  folds it into a constant).
* `apply_time_mask` / `apply_feature_mask` mirror the reference utilities
  (reference speech_jobs/wav2vec2_dist.py:1073-1119).  Like the reference,
  no training path calls them; the shift+OR run-expansion loop is replaced by
  an equivalent vectorized comparison against run start indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


NEG_INF = -1e9


def causal_additive_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """[1, 1, seq_len, seq_len] additive bias: 0 on/below diagonal, -1e9 above."""
    allowed = jnp.tril(jnp.ones((seq_len, seq_len), dtype=jnp.float32))
    bias = (1.0 - allowed) * NEG_INF
    return bias[None, None, :, :].astype(dtype)


def padding_additive_mask(attention_mask: jax.Array, dtype=jnp.float32,
                          scale: float = NEG_INF) -> jax.Array:
    """[B, T] {0,1} mask -> [B, 1, 1, T] additive bias `(1-mask)*scale`.

    The reference uses scale=-1e9 in Whisper (whisper_dist.py:150-154) and
    -10000 in Wav2Vec2 (wav2vec2_dist.py:355-357).
    """
    m = attention_mask.astype(jnp.float32)
    return ((1.0 - m) * scale)[:, None, None, :].astype(dtype)


def _run_mask(rng: jax.Array, batch: int, length: int, prob: float,
              run_length: int) -> jax.Array:
    """Bernoulli run-starts expanded to runs of `run_length` along `length`."""
    starts = jax.random.bernoulli(rng, prob, (batch, length))
    # position j is masked iff some start i in (j-run_length, j] fired
    idx = jnp.arange(length)
    window = (idx[None, :] - idx[:, None] >= 0) & (
        idx[None, :] - idx[:, None] < run_length
    )  # window[i, j]: start at i covers position j
    covered = jnp.einsum("bi,ij->bj", starts.astype(jnp.float32),
                         window.astype(jnp.float32))
    return covered > 0


def apply_time_mask(rng: jax.Array, hidden_states: jax.Array,
                    mask_prob: float = 0.05, mask_length: int = 10) -> jax.Array:
    """Zero out runs of time steps. hidden_states: [B, T, C]."""
    b, t, _ = hidden_states.shape
    mask = _run_mask(rng, b, t, mask_prob, mask_length)
    return jnp.where(mask[:, :, None], 0.0, hidden_states)


def apply_feature_mask(rng: jax.Array, hidden_states: jax.Array,
                       mask_prob: float = 0.0, mask_length: int = 10) -> jax.Array:
    """Zero out runs of feature channels. hidden_states: [B, T, C]."""
    b, _, c = hidden_states.shape
    mask = _run_mask(rng, b, c, mask_prob, mask_length)
    return jnp.where(mask[:, None, :], 0.0, hidden_states)
