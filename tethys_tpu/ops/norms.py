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
        # Moments over (T, C/G) per (B, G) — the reference's transpose +
        # tf.nn.moments(axes=[1, 2]) semantics — computed WITHOUT reshaping
        # the activation to [B, T, G, C/G]: a per-group-minor tensor puts a
        # 32-wide dim in the 128-lane position, so every pass runs on 4x
        # padded tiles plus relayout copies (profiled at ~25x the HBM
        # roofline).  Instead reduce over T in the natural [B, T, C] layout
        # to [B, C], then fold the tiny [B, C] into [B, G] group moments.
        # Variance is two-pass (E[(x-mu)^2], not E[x^2]-mu^2): conv
        # activations sit far from zero and the one-pass form loses ~3
        # digits to cancellation (BASELINE.md round-2 notes).
        xf = x.astype(jnp.float32)
        denom = t * per_group

        def t_reduce(y):  # [B, T, C] -> [B, C], sum over time
            # NOTE: tried as an MXU dot-against-ones too — measured an exact
            # wash vs the VPU reduce at every conv-stack shape (BASELINE.md
            # round-2 negative results); keep the plain reduce.
            return jnp.sum(y, axis=1)

        def group_fold(per_channel):  # [B, C] -> [B, G]
            return jnp.sum(
                per_channel.reshape(b, self.groups, per_group), axis=-1)

        def group_spread(per_group_vals):  # [B, G] -> [B, 1, C]
            return jnp.repeat(per_group_vals, per_group, axis=-1)[:, None, :]

        mean = group_spread(group_fold(t_reduce(xf)) / denom)
        centered = xf - mean
        var = group_spread(
            group_fold(t_reduce(jnp.square(centered))) / denom)
        out = gamma * (centered * jax.lax.rsqrt(var + self.epsilon)) + beta
        return out.astype(self.dtype)
