"""Scaled-dot-product attention core shared by Whisper and Wav2Vec2.

TPU-first design notes:
* queries are pre-scaled by head_dim^-0.5 (reference
  speech_jobs/whisper_dist.py:87,141 scales q, wav2vec2_dist.py:350 scales the
  scores — both are mathematically identical; we scale q once),
* the softmax runs in float32 regardless of compute dtype (bf16 logits lose
  too much precision at seq_len 1500),
* for long sequences on TPU the Pallas flash-attention kernel
  (`tethys_tpu.ops.pallas_attention`) streams KV blocks through VMEM instead
  of materializing the [B, H, T, T] score matrix in HBM; the XLA einsum path
  remains as the fallback (and is what runs on CPU test meshes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Flash kernel min sequence length.  The score matrix is HBM-bound above
# this; below it per-program overhead can dominate — env-overridable for
# A/B measurement on new shapes.
import os as _os

_FLASH_MIN_SEQ = int(_os.environ.get("TETHYS_FLASH_MIN_SEQ", "512"))
# Min QUERY length for the flash path.  Single-token (incremental decode)
# queries are matvecs — the XLA path is both faster and avoids a fresh
# multi-minute Mosaic kernel compile per decode shape.
_FLASH_MIN_TQ = int(_os.environ.get("TETHYS_FLASH_MIN_TQ", "16"))
# Take the flash path even off-TPU (pallas interpret mode) — lets CPU-mesh
# tests and the driver dry-run exercise the flash+GSPMD composition.
_FLASH_FORCE = _os.environ.get("TETHYS_FLASH_FORCE", "") == "1"


def _on_tpu() -> bool:
    from tethys_tpu.utils.device import target_platform

    return target_platform() == "tpu"


def flash_active(use_flash: bool, tq: int, tk: int) -> bool:
    """Whether multi_head_attention will take the pallas flash path for
    these sequence lengths (used by callers to pre-pad once per pass)."""
    return use_flash and (_on_tpu() or _FLASH_FORCE) and (
        tq >= _FLASH_MIN_TQ
    ) and (tq >= _FLASH_MIN_SEQ or tk >= _FLASH_MIN_SEQ)


def multi_head_attention(
    query: jax.Array,          # [B, H, Tq, D] (already scaled by D^-0.5)
    key: jax.Array,            # [B, H, Tk, D]
    value: jax.Array,          # [B, H, Tk, D]
    bias: Optional[jax.Array] = None,  # additive, broadcastable to [B, H, Tq, Tk]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_flash: bool = False,
    kv_len: Optional[int] = None,  # true KV length when key/value are padded
) -> jax.Array:
    """Returns [B, H, Tq, D] attention output."""
    if not deterministic and dropout_rate > 0.0 and dropout_rng is None:
        # Fail identically on every backend: the flash path would silently
        # train with attention dropout OFF while the XLA path crashed in
        # jax.random.bernoulli — masking the bug exactly on TPU.
        raise ValueError(
            "multi_head_attention: dropout_rate > 0 with "
            "deterministic=False requires dropout_rng")
    if flash_active(use_flash, query.shape[2], key.shape[2]):
        from tethys_tpu.ops import pallas_attention

        if pallas_attention.supported(query, key, value, bias):
            rate = 0.0 if deterministic else dropout_rate
            if rate > 0.0 and dropout_rng is not None:
                from tethys_tpu.ops.pallas_dropout import seed_from_rng

                seed = seed_from_rng(dropout_rng)
            else:
                rate, seed = 0.0, 0
            return pallas_attention.flash_attention(
                query, key, value, bias, dropout_rate=rate, seed=seed,
                kv_len=kv_len,
            )
    return _xla_attention(
        query, key, value, bias, dropout_rate, dropout_rng, deterministic,
        kv_len,
    )


def _xla_attention(query, key, value, bias, dropout_rate, dropout_rng,
                   deterministic, kv_len=None):
    out_dtype = query.dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", query, key, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if kv_len is not None and kv_len < key.shape[2]:
        from tethys_tpu.ops.masks import NEG_INF

        col = jnp.arange(key.shape[2])
        scores = jnp.where(col[None, None, None, :] < kv_len, scores,
                           NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    if not deterministic and dropout_rate > 0.0:
        from tethys_tpu.ops.pallas_dropout import auto_axes_in_scope

        if _on_tpu() and not auto_axes_in_scope():
            # On-core-PRNG dropout kernel on the compute-dtype probs: XLA's
            # bernoulli lowers to a threefry keystream + materialized mask
            # over the full [B, H, Tq, Tk] score tensor, a measurable slice
            # of the short-sequence (T=100) wav2vec2 attention cost.
            # (Under auto-sharded mesh axes — TP/SP — the sharding-invariant
            # jax.random path below runs instead; see pallas_dropout.)
            from tethys_tpu.ops.pallas_dropout import (
                fused_dropout, seed_from_rng,
            )

            probs = fused_dropout(probs, dropout_rate,
                                  seed_from_rng(dropout_rng))
        else:
            keep = jax.random.bernoulli(
                dropout_rng, 1.0 - dropout_rate, probs.shape)
            probs = jnp.where(
                keep, probs / jnp.asarray(1.0 - dropout_rate, out_dtype),
                jnp.zeros((), out_dtype))
    return jnp.einsum("bhqk,bhkd->bhqd", probs, value)


def decode_attention(
    query: jax.Array,     # [B, H, Tq, D] (already scaled)
    key_t: jax.Array,     # [B, H, D, Tk] — TRANSPOSED cache
    value_t: jax.Array,   # [B, H, D, Tk] — TRANSPOSED cache
    bias: Optional[jax.Array] = None,  # additive, e.g. the decode pos mask
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Attention for the serving decode step against TRANSPOSED K/V caches
    (cross-attention per-generate caches AND the incremental self-KV
    buffers).

    At head_dim 64 the standard [B, H, Tk, D] cache pads its minor dim to
    the 128-lane tile, so every decode step streams 2x the cache bytes —
    and the per-token decode is exactly this stream (round-4 profile:
    cross-attention K/V reads were 100.8 of 139 ms device per 128-token
    whisper-base generate, at ~47% of HBM peak; the transposed layout
    measured a 1.57x whole-decode speedup).  With Tk minor the rows are
    full 1536-lane tiles (D=64 = 8 sublanes, no padding).  Numerics: same
    contractions as `_xla_attention` (f32 scores, softmax, compute-dtype
    probs), no dropout (serving is deterministic).

    Returns [B, H, Tq, D]."""
    out_dtype = query.dtype
    scores = jnp.einsum("bhqd,bhdk->bhqk", query, key_t,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if kv_len is not None and kv_len < key_t.shape[3]:
        from tethys_tpu.ops.masks import NEG_INF

        col = jnp.arange(key_t.shape[3])
        scores = jnp.where(col[None, None, None, :] < kv_len, scores,
                           NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", probs, value_t)
