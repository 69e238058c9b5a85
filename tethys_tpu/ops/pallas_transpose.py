"""Fast head split/merge transposes as Pallas kernels.

Why: the flash-attention kernel (ops/pallas_attention.py) consumes the
[B, H, T, d] layout, but projections produce [B, T, H*d].  XLA implements the
[B,T,H,d]->[B,H,T,d] permute feeding a pallas custom-call as a generic
transpose-copy fusion measured at ~10% of HBM bandwidth — 29 ms of a 99 ms
whisper-base train step in the round-1 profile (BASELINE.md "Profiling
notes").  These kernels do the same data movement as contiguous whole-rows
DMA + in-register lane slicing: one [T, H*d] VMEM tile in, H packed [T, d]
slabs out (and the inverse).

Both directions carry a custom VJP (the cotangent of a permute is the inverse
permute), so forward and backward passes both stay off XLA's slow path.

Used by WhisperAttention and Wav2Vec2 attention (reference computes the same
permutes eagerly: speech_jobs/whisper_dist.py:95-101 `_reshape`,
wav2vec2_dist.py:330-340).  Non-TPU backends fall back to jnp reshape+
transpose (identical semantics, tested in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = False  # tests flip this to exercise kernels off-TPU

# VMEM budget for one (in tile + out tile) pair, POST-padding, pre-double-
# buffering.  Mosaic double-buffers every grid-streamed block and XLA checks
# the total against its ~16 MB scoped-vmem limit, so the real footprint is
# 2x this number; 6 MB keeps medium/large under the limit with margin.
# Whisper-base fits whole-T (no behavior change); whisper-medium's 1024-d
# whole-T tile measured 18 MB actual (the per-head [T, 64] out slabs pad to
# 128 lanes, doubling the out tile) and is split along T instead.
_MAX_TILE_BYTES = 6 * 1024 * 1024


def _on_tpu() -> bool:
    if _INTERPRET:
        return True
    from tethys_tpu.utils.device import target_platform

    return target_platform() == "tpu"


def _sublane(dtype) -> int:
    # TPU second-minor tile granularity by element width.
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _tile_bytes(t_blk: int, num_heads: int, head_dim: int, dtype) -> int:
    """Padded VMEM bytes of one in+out block pair at T-block size t_blk."""
    itemsize = jnp.dtype(dtype).itemsize
    lanes = 128
    flat = t_blk * (-(-num_heads * head_dim // lanes) * lanes)   # [T, H*d]
    split = num_heads * t_blk * (-(-head_dim // lanes) * lanes)  # [H, T, d]
    return (flat + split) * itemsize


def _choose_t_block(t: int, num_heads: int, head_dim: int, dtype):
    """Largest T-block (a divisor of t, sublane-aligned) whose padded in+out
    tiles fit _MAX_TILE_BYTES; None when no legal block fits (callers fall
    back to the XLA transpose).  Whole-T is preferred — it is always legal
    (block dims equal to the array dims need no alignment)."""
    if _tile_bytes(t, num_heads, head_dim, dtype) <= _MAX_TILE_BYTES:
        return t
    step = _sublane(dtype)
    for t_blk in range(t // 2, step - 1, -1):
        if t % t_blk or t_blk % step:
            continue
        if _tile_bytes(t_blk, num_heads, head_dim, dtype) <= _MAX_TILE_BYTES:
            return t_blk
    return None


def _split_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int):
    x = x_ref[0]                                   # [T, H*d]
    for h in range(num_heads):
        o_ref[0, h] = x[:, h * head_dim:(h + 1) * head_dim]


def _merge_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int):
    for h in range(num_heads):
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = x_ref[0, h]


def _split_call(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d_model = x.shape
    head_dim = d_model // num_heads
    t_blk = _choose_t_block(t, num_heads, head_dim, x.dtype)
    return pl.pallas_call(
        functools.partial(_split_kernel, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(b, t // t_blk),
        in_specs=[pl.BlockSpec((1, t_blk, d_model), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, num_heads, t_blk, head_dim),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, t, head_dim), x.dtype),
        interpret=_INTERPRET,
    )(x)


def _merge_call(x: jax.Array) -> jax.Array:
    b, num_heads, t, head_dim = x.shape
    d_model = num_heads * head_dim
    t_blk = _choose_t_block(t, num_heads, head_dim, x.dtype)
    return pl.pallas_call(
        functools.partial(_merge_kernel, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(b, t // t_blk),
        in_specs=[pl.BlockSpec((1, num_heads, t_blk, head_dim),
                               lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, t_blk, d_model), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d_model), x.dtype),
        interpret=_INTERPRET,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _split(x, num_heads):
    return _split_call(x, num_heads)


def _split_fwd(x, num_heads):
    return _split_call(x, num_heads), None


def _split_bwd(num_heads, _, dy):
    return (_merge_call(dy),)


_split.defvjp(_split_fwd, _split_bwd)


@jax.custom_vjp
def _merge(x):
    return _merge_call(x)


def _merge_fwd(x):
    return _merge_call(x), x.shape[1]


def _merge_bwd(num_heads, dy):
    return (_split_call(dy, num_heads),)


_merge.defvjp(_merge_fwd, _merge_bwd)


# Implementation choice per direction, settled by whole-step A/B benchmarks
# on v5e (whisper-base step: split=pallas/merge=xla 92.0 ms vs
# split=xla/merge=pallas 95.7 ms; isolated micro-benchmarks rank the
# opposite way — in-graph fusion context matters).  Env-overridable for
# future A/B measurement.
import os as _os

SPLIT_IMPL = _os.environ.get("TETHYS_SPLIT_IMPL", "pallas")
MERGE_IMPL = _os.environ.get("TETHYS_MERGE_IMPL", "xla")


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, T, H*d] -> [B, H, T, d]; pallas on TPU, jnp elsewhere."""
    b, t, d_model = x.shape
    head_dim = d_model // num_heads
    if (SPLIT_IMPL == "pallas" and _on_tpu()
            and d_model == num_heads * head_dim
            and _choose_t_block(t, num_heads, head_dim, x.dtype) is not None):
        return _split(x, num_heads)
    return x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, T, d] -> [B, T, H*d]; pallas on TPU, jnp elsewhere."""
    b, num_heads, t, head_dim = x.shape
    if (MERGE_IMPL == "pallas" and _on_tpu()
            and _choose_t_block(t, num_heads, head_dim, x.dtype) is not None):
        return _merge(x)
    return x.transpose(0, 2, 1, 3).reshape(b, t, num_heads * head_dim)
