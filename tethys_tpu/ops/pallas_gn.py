"""Single-read GroupNorm statistics kernel.

The wav2vec2 conv backbone's GroupNorm runs two full passes over each conv
activation for its moments (mean reduce, then centered-square reduce —
profiled at ~6 ms/step across the 7 layers, ~6x the one-read HBM roofline;
reference semantics in ops/norms.ReferenceGroupNorm, reference
speech_jobs/wav2vec2_dist.py:140-196).  This kernel reads the activation
ONCE: each grid program loads a [CHUNK, C] tile into VMEM, computes the
chunk's per-channel mean and centered second moment there (an in-VMEM
two-pass — numerically the stable E[(x-mu)^2] form, no E[x^2]-mu^2
cancellation), and writes the tiny [B, n_chunks, C] partials.  The host
side combines chunks, then channels into groups, with Chan's parallel
variance formula — exact, order-stable.

Gating mirrors ops/pallas_dropout: TPU only (interpret mode for CPU
tests), and NOT under auto-sharded mesh axes — the kernel is an opaque
custom call GSPMD cannot partition, and under TP the channel dim may be
model-sharded (the jnp two-pass path handles that case fine).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("TETHYS_PALLAS_INTERPRET", "") == "1"

# Sublane-group the partial outputs like pallas_attention's lse tile: TPU
# output blocks want (8, 128)-aligned trailing dims, so each chunk writes
# its [C] stats broadcast over 8 rows and the host reads row 0.
_ROWS = 8
_MAX_CHUNK = 512


def stats_chunk(t: int) -> int:
    """Largest divisor of t that is <= _MAX_CHUNK and a multiple of 8, or 0
    when none exists (caller falls back to the jnp path)."""
    best = 0
    for c in range(8, min(t, _MAX_CHUNK) + 1, 8):
        if t % c == 0:
            best = c
    return best


def _stats_kernel(x_ref, mean_ref, m2_ref, *, chunk: int):
    x = x_ref[0].astype(jnp.float32)          # [CHUNK, C]
    mu = jnp.sum(x, axis=0) / chunk           # [C]
    d = x - mu[None, :]
    m2 = jnp.sum(d * d, axis=0)               # [C]
    mean_ref[0] = jnp.broadcast_to(mu[None, :], (_ROWS, x.shape[1]))
    m2_ref[0] = jnp.broadcast_to(m2[None, :], (_ROWS, x.shape[1]))


def chunk_stats(x: jax.Array, chunk: int):
    """x: [B, T, C] -> per-chunk (means, m2s), each [B, T//chunk, C] f32."""
    b, t, c = x.shape
    n_chunks = t // chunk
    kernel = functools.partial(_stats_kernel, chunk=chunk)
    out_shape = [
        jax.ShapeDtypeStruct((b, n_chunks * _ROWS, c), jnp.float32),
        jax.ShapeDtypeStruct((b, n_chunks * _ROWS, c), jnp.float32),
    ]
    means, m2s = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda b_, j: (b_, j, 0))],
        out_specs=[
            pl.BlockSpec((1, _ROWS, c), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, _ROWS, c), lambda b_, j: (b_, j, 0)),
        ],
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(x)
    means = means.reshape(b, n_chunks, _ROWS, c)[:, :, 0, :]
    m2s = m2s.reshape(b, n_chunks, _ROWS, c)[:, :, 0, :]
    return means, m2s


def group_moments(x: jax.Array, groups: int):
    """Exact per-(batch, group) (mean, var) over (T, C//groups) from ONE
    HBM read of x, or None when the shape/backend does not qualify."""
    b, t, c = x.shape
    chunk = stats_chunk(t)
    if chunk == 0:
        return None
    means, m2s = chunk_stats(x, chunk)        # [B, NCH, C]
    n_chunks = t // chunk
    # Chan combine over chunks -> per-channel stats (equal chunk counts).
    mean_c = jnp.mean(means, axis=1)          # [B, C]
    m2_c = jnp.sum(m2s, axis=1) + chunk * jnp.sum(
        jnp.square(means - mean_c[:, None, :]), axis=1)
    del n_chunks
    # Chan combine over channels-within-group -> [B, G] (equal counts t).
    pg = c // groups
    mean_cg = mean_c.reshape(b, groups, pg)
    m2_cg = m2_c.reshape(b, groups, pg)
    mean_g = jnp.mean(mean_cg, axis=-1)       # [B, G]
    m2_g = jnp.sum(m2_cg, axis=-1) + t * jnp.sum(
        jnp.square(mean_cg - mean_g[..., None]), axis=-1)
    var_g = m2_g / (t * pg)
    return mean_g, var_g
