"""Normalization layers.

`ReferenceGroupNorm` reproduces the reference's hand-rolled GroupNormalization
(reference speech_jobs/wav2vec2_dist.py:140-196) *exactly*, including its two
non-standard choices:

1. the group count is `num_conv_pos_embedding_groups` (e.g. 16 for base), not
   the HF-style per-channel norm, and
2. moments are taken over (time, channels-within-group) jointly — i.e. the
   reshaped [B, T, G, C/G] tensor is normalized over axes (T, C/G) per
   (batch, group).

Standard LayerNorm comes from flax.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ReferenceGroupNorm(nn.Module):
    """Group normalization over the feature axis with reference semantics.

    Input: [batch, time, channels]; channels must divide `groups`.
    """

    groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        if channels % self.groups != 0:
            raise ValueError(
                f"channels ({channels}) must be divisible by groups ({self.groups})"
            )
        gamma = self.param("gamma", nn.initializers.ones, (channels,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (channels,), jnp.float32)

        b, t, c = x.shape
        per_group = c // self.groups
        # [B, T, C] -> [B, T, G, C/G]; moments over (T, C/G) per (B, G),
        # matching the reference's transpose + tf.nn.moments(axes=[1, 2]).
        xg = x.reshape(b, t, self.groups, per_group).astype(jnp.float32)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        normed = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = normed.reshape(b, t, c)
        out = gamma * normed + beta
        return out.astype(self.dtype)
