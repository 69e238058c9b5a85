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

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _gn_core(groups: int, eps: float):
    """GroupNorm core with an ANALYTIC backward (round-3).

    The forward keeps the exact decomposition the module always used
    (T-reduction in natural [B, T, C] layout, fold to [B, G], two-pass
    variance) so XLA's conv-epilogue stats fusions survive — the pallas
    stats/apply kernel was round 2's measured NEGATIVE.  What changes is
    the backward: autodiff through the two-pass moments re-derives dmean /
    dvar chains that cost ~7-8 passes over the activation; the closed form

        dx   = r . (dy.g - mean_S(dy.g) - xhat . mean_S(dy.g.xhat))
        dg_c = sum_{b,t} dy.xhat,   db_c = sum_{b,t} dy

    needs ONE joint stats pass (A = sum_t dy.xhat, B = sum_t dy serve all
    four reductions) plus one apply pass — 5 big-tensor touches total.
    """
    @jax.custom_vjp
    def core(x, gamma, beta):
        return _forward(x, gamma, beta)[0]

    def _spread(v, pg):  # [B, G] -> [B, 1, C]
        return jnp.repeat(v, pg, axis=-1)[:, None, :]

    def _fold(per_channel, b, pg):  # [B, C] -> [B, G]
        return jnp.sum(per_channel.reshape(b, groups, pg), axis=-1)

    def _forward(x, gamma, beta):
        b, t, c = x.shape
        pg = c // groups
        n = t * pg
        xf = x.astype(jnp.float32)
        moments = _kernel_moments(x, t)
        if moments is not None:
            mean_g, var_g = moments
            mu = _spread(mean_g, pg)
            r = _spread(jax.lax.rsqrt(var_g + eps), pg)
            y = gamma * ((xf - mu) * r) + beta
            return y, (x, mu, r, gamma)
        mu = _spread(_fold(jnp.sum(xf, axis=1), b, pg) / n, pg)
        centered = xf - mu
        var = _fold(jnp.sum(jnp.square(centered), axis=1), b, pg) / n
        r = _spread(jax.lax.rsqrt(var + eps), pg)
        y = gamma * (centered * r) + beta
        return y, (x, mu, r, gamma)

    def _kernel_moments(x, t):
        """Single-read pallas moments (ops/pallas_gn) — OPT-IN ONLY
        (TETHYS_GN_KERNEL=1): the whole-step A/B on the v5e chip measured
        the kernel path SLOWER (42.4 vs 39.7 ms wav2vec2-base step) — the
        pallas call forces the conv output to fully materialize before the
        stats read, losing more overlap than the saved second pass buys
        (BASELINE.md round-3 negative results; same failure mode as the
        round-2 fused stats/apply attempt, now isolated to stats alone).
        Kept behind the env knob with its correctness tests so the next
        round doesn't rebuild it blind."""
        import os

        from tethys_tpu.ops import pallas_gn
        from tethys_tpu.ops.attention import _on_tpu
        from tethys_tpu.ops.pallas_dropout import auto_axes_in_scope

        if os.environ.get("TETHYS_GN_KERNEL", "0") != "1":
            return None
        if t * x.shape[0] * x.shape[2] < (1 << 16):
            return None  # tiny: not worth a kernel launch
        if not (_on_tpu() or pallas_gn._INTERPRET):
            return None
        if auto_axes_in_scope():
            return None
        return pallas_gn.group_moments(x, groups)

    def fwd_rule(x, gamma, beta):
        y, res = _forward(x, gamma, beta)
        return y, res

    def bwd_rule(res, dy):
        x, mu, r, gamma = res
        b, t, c = x.shape
        pg = c // groups
        n = t * pg
        dyf = dy.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        xhat = (xf - mu) * r
        # Joint stats pass: A and B feed dgamma/dbeta AND the group means.
        A = jnp.sum(dyf * xhat, axis=1)      # [B, C]
        B = jnp.sum(dyf, axis=1)             # [B, C]
        dgamma = jnp.sum(A, axis=0)
        dbeta = jnp.sum(B, axis=0)
        s1 = _spread(_fold(B * gamma, b, pg) / n, pg)
        s2 = _spread(_fold(A * gamma, b, pg) / n, pg)
        dx = r * (dyf * gamma - s1 - xhat * s2)
        return dx.astype(x.dtype), dgamma, dbeta

    core.defvjp(fwd_rule, bwd_rule)
    return core


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
        del b, t, per_group  # shape math lives in _gn_core
        out = _gn_core(self.groups, float(self.epsilon))(x, gamma, beta)
        return out.astype(self.dtype)
