"""Fused flash attention (fwd + bwd) with in-kernel probability dropout.

Why this kernel exists: the reference applies dropout to the attention
probabilities during training (reference speech_jobs/whisper_dist.py:160,
wav2vec2_dist.py:360).  Under plain XLA at seq_len 1500 that means
materializing the [B, H, T, T] probability tensor in HBM *and* generating a
same-shaped random mask — measured at ~2x the whole train step on v5e.  This
kernel streams K/V blocks through VMEM (classic flash attention: online
softmax with running max/denominator) and draws the dropout mask from the
TPU's per-core PRNG inside the kernel, seeded per (batch*head, q-block,
k-block) so the backward pass can regenerate the identical mask without
storing it.

Semantics: out = dropout(softmax(q @ k^T + mask)) @ v with dropout applied to
the *normalized* probabilities (TF/Keras semantics), scaled by 1/(1-rate).
q is expected pre-scaled (by head_dim^-0.5) like the XLA path.

Residuals saved for backward: o and L = m + log(l) (per-row logsumexp).
Backward uses the standard flash decomposition
    dv = (M.P/(1-r))^T do
    ds = P . (M.(do v^T)/(1-r) - D),   D = rowsum(do . o)
    dq = ds k,  dk = ds^T q
with P = exp(s - L) recomputed blockwise and M regenerated from the seed.

Constraints: head_dim <= 128 (all Whisper/Wav2Vec2 sizes use 64), no
attention bias — used for encoder self-attention AND decoder cross-attention
(short queries over long KV); only the short causal decoder self-attention
stays on XLA.  Sequences are padded to the 128-lane block size with zero-q /
masked-k handling.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large blocks: at head_dim 64 a [512, 2048] f32 score tile is 4 MB of VMEM,
# and big tiles keep the MXU busy while slashing grid-dispatch overhead
# (128x128 blocks meant ~18k programs per layer at seq 1536).
MAX_BLOCK_Q = 512
MAX_BLOCK_K = 2048
NEG_INF = -1e30


def _fit_block(t: int, max_block: int) -> int:
    """Largest 128-multiple block <= max_block that tiles ceil128(t) evenly.

    Preferring an exact divisor over the plain min() keeps sequence-parallel
    LOCAL shard lengths (e.g. 1536/2 = 768) pad-free: 768 gets block 384
    instead of 512-with-256-padding."""
    tpad = -(-t // 128) * 128
    for b in range(min(max_block, tpad), 127, -128):
        if tpad % b == 0:
            return b
    return 128


def _block_sizes(tq: int, tk: int):
    return _fit_block(tq, MAX_BLOCK_Q), _fit_block(tk, MAX_BLOCK_K)

# True -> run kernels in pallas interpreter mode (tests set this directly;
# the env knob serves subprocess runs like the driver's multichip dry-run).
_INTERPRET = os.environ.get("TETHYS_PALLAS_INTERPRET", "") == "1"


def supported(query, key, value, bias) -> bool:
    """Gate used by ops.attention: no bias, head_dim <= 128, self-attn-sized."""
    if bias is not None:
        return False
    if query.shape[-1] > 128:
        return False
    return True


def _seed_for_block(base_seed, b, i, j):
    # Distinct, order-independent stream per (batch*head, q-block, k-block).
    return base_seed + b * 1000003 + i * 7919 + j * 104729


def _kv_mask_add(s, j, block_k: int, kv_len: int, mask_kv: bool):
    """Mask padded KV columns of a [BQ, BK] score tile.

    Round-3 VPU trim: build a [1, BK] additive row mask (0 / NEG_INF) — the
    iota/compare/select run on BK elements, and the per-element cost is ONE
    broadcast add (the old form ran iota+compare+select on the full tile).
    s + (-1e30) == -1e30 exactly in f32 (absorption), so max/exp behave
    identically to the select.  `mask_kv` is static: when kv_len covers
    every block (no padding), the mask vanishes from the kernel entirely."""
    if not mask_kv:
        return s
    col = jax.lax.broadcasted_iota(
        jnp.int32, (1, s.shape[-1]), 1) + j * block_k
    row = jnp.where(col < kv_len, 0.0, NEG_INF).astype(s.dtype)
    return s + row


def _kv_mask_select(s, j, block_k: int, kv_len: int, mask_kv: bool):
    """Full-tile select variant (iota+cmp+select per element): measured
    FASTER than the broadcast add inside the backward kernels (Mosaic lowers
    the [1, BK]->[BQ, BK] broadcast there as a relayout; A/B in
    BASELINE.md), so the backward keeps the select while the forward uses
    the additive form."""
    if not mask_kv:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    return jnp.where(col < kv_len, s, NEG_INF)


def _dropout_mask(base_seed, b, i, j, shape, rate: float):
    seed = _seed_for_block(base_seed, b, i, j)
    if _INTERPRET:
        # pltpu.prng_seed has no CPU lowering; interpret mode draws the mask
        # via jax.random instead.  Same per-block seed formula, so forward
        # and backward still agree (values differ from the TPU keystream —
        # interpret is test-only).
        key = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        return jax.random.uniform(key, shape) >= rate
    pltpu.prng_seed(seed)
    # prng_random_bits yields int32 bit patterns; reinterpret as uint32
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold  # True = keep, P(drop) = rate


# ---------------------------------------------------------------------------
# Forward

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, kv_len: int, num_k_blocks: int,
                dropout_rate: float, block_k: int, mask_kv: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    if num_k_blocks == 1:
        # Whole KV in one block (every sequence length this framework
        # meets): plain softmax — no online m/l scratch, no acc rescale.
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = _kv_mask_add(s, j, block_k, kv_len, mask_kv)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[:, None])
        l = jnp.sum(p, axis=-1)
        if dropout_rate > 0.0:
            keep = _dropout_mask(seed_ref[0], b, i, j, p.shape, dropout_rate)
            p = jnp.where(keep, p, 0.0)
            scale = 1.0 / (1.0 - dropout_rate)
        else:
            scale = 1.0
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (out * (scale / l)[:, None]).astype(o_ref.dtype)
        lse = m + jnp.log(l)
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])
        return

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # [BQ, D]
    k = k_ref[0]                      # [BK, D]
    v = v_ref[0]                      # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                 # [BQ, BK]
    s = _kv_mask_add(s, j, block_k, kv_len, mask_kv)

    m_prev = m_ref[:, 0]              # [BQ]
    l_prev = l_ref[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])   # un-normalized probs, f32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)

    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref[0], b, i, j, p.shape, dropout_rate)
        p_use = jnp.where(keep, p, 0.0)
    else:
        p_use = p

    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p_use.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(j == num_k_blocks - 1)
    def _():
        l_final = l_ref[:, 0]
        scale = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
        o_ref[0] = (acc_ref[:] * (scale / l_final)[:, None]).astype(o_ref.dtype)
        lse = m_ref[:, 0] + jnp.log(l_final)
        # [1, 8, BQ] tile: TPU blocks need (8, 128)-aligned trailing dims
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _flash_fwd(q, k, v, seed, dropout_rate: float, kv_len: int):
    bh, tq, d = q.shape
    _, tk, _ = k.shape
    BLOCK_Q, BLOCK_K = _block_sizes(tq, tk)
    num_q = tq // BLOCK_Q
    num_k = tk // BLOCK_K

    kernel = functools.partial(
        _fwd_kernel, kv_len=kv_len, num_k_blocks=num_k,
        dropout_rate=dropout_rate, block_k=BLOCK_K,
        mask_kv=kv_len < num_k * BLOCK_K,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j, *_: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, BLOCK_Q), lambda b, i, j, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, d), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 128), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 128), jnp.float32),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        jax.ShapeDtypeStruct((bh, 8, tq), jnp.float32),  # lse, sublane-bcast
    ]
    o, lse = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=_INTERPRET,
    )(seed, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward

def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_acc_ref, *, kv_len: int, num_k_blocks: int,
                   dropout_rate: float, block_k: int, mask_kv: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # Round-3 MXU fix: keep do in its storage dtype (bf16 in training) so
    # the dp dot runs on the fast MXU path instead of f32 (do is ALREADY
    # bf16-rounded in HBM, so the bf16 x bf16 dot with f32 accumulation
    # computes the same products the old upcast-to-f32 dot did).  The
    # dropout 1/(1-r) moves to the epilogue: with
    #     t = M.dp_unscaled - delta*(1-r),   ds = inv * (p . t)
    # the true dq = inv * (p . t) @ k — one [BQ, D] scale at the final
    # write instead of any per-score-element scaling.
    do = do_ref[0]
    lse = lse_ref[0, 0]               # [BQ]
    delta = delta_ref[0, 0]           # [BQ]
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    delta_s = delta * (1.0 - dropout_rate) if dropout_rate > 0.0 else delta

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _kv_mask_select(s, j, block_k, kv_len, mask_kv)
    p = jnp.exp(s - lse[:, None])     # normalized probs

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref[0], b, i, j, p.shape, dropout_rate)
        dp = jnp.where(keep, dp, 0.0)
    ds = p * (dp - delta_s[:, None])  # unscaled: true ds = inv * this
    dq_acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _():
        dq_ref[0] = (dq_acc_ref[:] * inv).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc_ref, dv_acc_ref, *, kv_len: int,
                    num_q_blocks: int, dropout_rate: float, block_k: int,
                    mask_kv: bool, dq_ref=None):
    """dk/dv backward; when `dq_ref` is given (single-KV-block case) also
    emits dq = ds @ k per q block — one extra MXU matmul instead of a whole
    second kernel re-deriving s, p and dp (the dq pass was ~1.8 ms/layer of
    mostly-VPU recompute on whisper-base; this fusion removes it)."""
    b = pl.program_id(0)
    j = pl.program_id(1)              # k block
    i = pl.program_id(2)              # q block (inner)

    @pl.when(i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # Round-3 MXU fix (see _bwd_dq_kernel): do stays in its storage dtype so
    # the dv and dp dots run bf16 x bf16 with f32 accumulation (do is
    # already bf16 in HBM — the products are identical to the old upcast-f32
    # dots; only p_drop's cast to the dot dtype newly rounds, mirroring the
    # forward's p.astype(v.dtype)).  All dropout 1/(1-r) scaling moves to
    # the [BK, D]/[BQ, D] epilogues:
    #     dv = inv * (M.P)^T do
    #     ds = inv * (p . (M.dp_unscaled - delta*(1-r)))
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    delta_s = delta * (1.0 - dropout_rate) if dropout_rate > 0.0 else delta

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _kv_mask_select(s, j, block_k, kv_len, mask_kv)
    p = jnp.exp(s - lse[:, None])     # [BQ, BK]

    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref[0], b, i, j, p.shape, dropout_rate)
        p_drop = jnp.where(keep, p, 0.0)
    else:
        keep = None
        p_drop = p

    # dv += (M.P)^T do  (inv applied at the final write)
    dv_acc_ref[:] += jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp, 0.0)
    ds = p * (dp - delta_s[:, None])  # unscaled: true ds = inv * this
    dk_acc_ref[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if dq_ref is not None:            # num_k == 1: dq is exact per q block
        dq_ref[0] = (jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv).astype(dq_ref.dtype)

    @pl.when(i == num_q_blocks - 1)
    def _():
        dk_ref[0] = (dk_acc_ref[:] * inv).astype(dk_ref.dtype)
        dv_ref[0] = (dv_acc_ref[:] * inv).astype(dv_ref.dtype)


def _bwd_dkv_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dq_ref, dk_acc_ref,
                       dv_acc_ref, **kw):
    _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc_ref, dv_acc_ref, dq_ref=dq_ref,
                    **kw)


def _flash_bwd(q, k, v, o, lse, do, seed, dropout_rate: float, kv_len: int):
    bh, tq, d = q.shape
    _, tk, _ = k.shape
    BLOCK_Q, BLOCK_K = _block_sizes(tq, tk)
    num_q = tq // BLOCK_Q
    num_k = tk // BLOCK_K

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)          # [BH, TQ]
    delta = jnp.broadcast_to(delta[:, None, :], (bh, 8, tq))

    if num_k == 1:
        # Single KV block (all sequence lengths this framework meets):
        # each (b, j=0, i) program sees the FULL ds tile for q block i, so
        # dq falls out exactly — no separate dq pass (see kernel docstring).
        fused_kernel = functools.partial(
            _bwd_dkv_dq_kernel, kv_len=kv_len, num_q_blocks=num_q,
            dropout_rate=dropout_rate, block_k=BLOCK_K,
            mask_kv=kv_len < num_k * BLOCK_K)
        dk, dv, dq = pl.pallas_call(
            fused_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bh, num_k, num_q),
                in_specs=[
                    pl.BlockSpec((1, BLOCK_Q, d), lambda b, j, i, *_: (b, i, 0)),
                    pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                    pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                    pl.BlockSpec((1, BLOCK_Q, d), lambda b, j, i, *_: (b, i, 0)),
                    pl.BlockSpec((1, 8, BLOCK_Q), lambda b, j, i, *_: (b, 0, i)),
                    pl.BlockSpec((1, 8, BLOCK_Q), lambda b, j, i, *_: (b, 0, i)),
                ],
                out_specs=[
                    pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                    pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                    pl.BlockSpec((1, BLOCK_Q, d), lambda b, j, i, *_: (b, i, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((BLOCK_K, d), jnp.float32),
                    pltpu.VMEM((BLOCK_K, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, tk, d), k.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), v.dtype),
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            ],
            interpret=_INTERPRET,
        )(seed, q, k, v, do, lse, delta)
        return dq, dk, dv

    dq_kernel = functools.partial(
        _bwd_dq_kernel, kv_len=kv_len, num_k_blocks=num_k,
        dropout_rate=dropout_rate, block_k=BLOCK_K,
        mask_kv=kv_len < num_k * BLOCK_K)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, num_q, num_k),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j, *_: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j, *_: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda b, i, j, *_: (b, 0, i)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda b, i, j, *_: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j, *_: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((BLOCK_Q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=_INTERPRET,
    )(seed, q, k, v, do, lse, delta)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, kv_len=kv_len, num_q_blocks=num_q,
        dropout_rate=dropout_rate, block_k=BLOCK_K,
        mask_kv=kv_len < num_k * BLOCK_K)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, num_k, num_q),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, d), lambda b, j, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_Q, d), lambda b, j, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda b, j, i, *_: (b, 0, i)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda b, j, i, *_: (b, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_K, d), lambda b, j, i, *_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_K, d), jnp.float32),
                pltpu.VMEM((BLOCK_K, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, tk, d), v.dtype),
        ],
        interpret=_INTERPRET,
    )(seed, q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# GSPMD partitioning (jax.experimental.custom_partitioning)
#
# The pallas kernels are opaque custom calls GSPMD cannot split on its own
# (the round-2 gap: `--tp` handed the partitioner an unpartitionable call on
# the hot path).  Attention is independent per (batch, head) and — once K/V
# are full-length — per query row, so we teach the partitioner exactly that:
#
#   * batch / head / query-length dims of q may be sharded (TP shards heads,
#     SP shards the query rows, DP shards batch),
#   * key-length and head_dim are force-gathered (arg_shardings below),
#   * in the backward, dk/dv computed from a query shard are partial sums —
#     psum'd over the mesh axes the query length is sharded on.
#
# Two sharding representations reach the callbacks: NamedSharding (top-level
# jit over a mesh) with a usable .spec, and GSPMDSharding (inside a
# partial-manual shard_map region, e.g. the hardened trainer's auto 'model'
# axis) where only HLO tile dims are visible and mesh axis names are NOT in
# scope.  In the latter case sharded batch/head dims pass through unchanged
# (no collectives needed); anything else falls back to full replication —
# correct, never fast-and-wrong.
#
# Dropout note: in-kernel PRNG seeds use LOCAL (shard) block coordinates, so
# the drawn mask depends on the sharding layout (head-shards at equal local
# offsets reuse mask blocks).  Each element is still Bernoulli(rate) and the
# forward/backward masks agree because both callbacks derive the partitioning
# from q's sharding with the same formula; cross-shard mask correlation is a
# documented statistical quirk, not an error.

from jax.experimental.custom_partitioning import custom_partitioning


def _spec4(sharding):
    """PartitionSpec entries padded to rank 4, or None if unavailable."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return None
    out = list(spec) + [None] * (4 - len(spec))
    return out[:4]


def _hlo_sharded_dims(sharding, ndim):
    hlo = getattr(sharding, "_hlo_sharding", None)
    if hlo is None or hlo.is_replicated():
        return []
    dims = list(hlo.tile_assignment_dimensions())
    return [i for i in range(min(ndim, len(dims))) if dims[i] > 1]


def _replicated_like(sharding):
    from jax._src.sharding_impls import GSPMDSharding

    return GSPMDSharding.get_replicated(sharding._device_assignment)


def _axis_tuple(entry):
    if entry is None:
        return ()
    if isinstance(entry, (tuple, list)):
        return tuple(entry)
    return (entry,)


def _pad_rows(x3, block):
    """Pad [BH, T, D]/[BH, 8, T] rows so the local shard tiles evenly (a
    no-op at the entry-point-padded global shapes; only sequence shards with
    odd local lengths pay it)."""
    t = x3.shape[1]
    tpad = -(-t // block) * block
    return _pad_to(x3, tpad, 1), t


def _fwd4(q, k, v, seed_arr, *, dropout_rate: float, kv_len: int):
    """Local (per-shard) forward on the [B, H, T, D] layout."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk)
    q3, _ = _pad_rows(q.reshape(b * h, tq, d), bq)
    k3, _ = _pad_rows(k.reshape(b * h, tk, d), bk)
    v3, _ = _pad_rows(v.reshape(b * h, tk, d), bk)
    o, lse = _flash_fwd(q3, k3, v3, seed_arr, dropout_rate, kv_len)
    return (o[:, :tq].reshape(b, h, tq, d),
            lse[:, :, :tq].reshape(b, h, 8, tq))


def _bwd4(q, k, v, o, lse, do, seed_arr, *, dropout_rate: float, kv_len: int):
    """Local (per-shard) backward; dk/dv are PARTIAL over local q rows."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk)
    q3, _ = _pad_rows(q.reshape(b * h, tq, d), bq)
    o3, _ = _pad_rows(o.reshape(b * h, tq, d), bq)
    do3, _ = _pad_rows(do.reshape(b * h, tq, d), bq)
    k3, _ = _pad_rows(k.reshape(b * h, tk, d), bk)
    v3, _ = _pad_rows(v.reshape(b * h, tk, d), bk)
    lse3 = lse.reshape(b * h, 8, tq)
    if q3.shape[1] != tq:
        # Padded q rows get a harmless finite lse (p = exp(s - 1) is NOT
        # zero, ~0.37/column); their gradients still vanish because the
        # padded do/delta rows are zero (ds = p*(0-0), dv += p^T @ 0).
        # Do not reuse these p values for anything but zero-do rows.
        lse3 = _pad_to(lse3, q3.shape[1], 2)
        lse3 = jnp.where(
            jnp.arange(q3.shape[1])[None, None, :] < tq, lse3, 1.0)
    dq, dk, dv = _flash_bwd(q3, k3, v3, o3, lse3, do3, seed_arr,
                            dropout_rate, kv_len)
    return (dq[:, :tq].reshape(b, h, tq, d),
            dk[:, :tk].reshape(b, h, tk, d),
            dv[:, :tk].reshape(b, h, tk, d))


def _fwd_shardings(mesh, q_sharding):
    """(q/o, kv, lse, seed) shardings + the axes q's length is sharded on,
    or None when the NamedSharding path does not apply."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = _spec4(q_sharding)
    if spec is None or mesh is None or not getattr(mesh, "axis_names", ()):
        return None
    b, h, tq = spec[0], spec[1], spec[2]
    return dict(
        q=NamedSharding(mesh, P(b, h, tq, None)),
        kv=NamedSharding(mesh, P(b, h, None, None)),
        lse=NamedSharding(mesh, P(b, h, None, tq)),
        seed=NamedSharding(mesh, P(None)),
        tq_axes=_axis_tuple(tq),
    )


def _passthrough_ok(shardings):
    """GSPMDSharding path: partitionable iff only batch/head dims split."""
    return all(set(_hlo_sharded_dims(s, 4)) <= {0, 1} for s in shardings)


@functools.lru_cache(maxsize=None)
def _make_fwd_cp(dropout_rate: float, kv_len: int):
    def impl(q, k, v, seed_arr):
        return _fwd4(q, k, v, seed_arr, dropout_rate=dropout_rate,
                     kv_len=kv_len)

    cp = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        sh = _fwd_shardings(mesh, arg_shapes[0].sharding)
        if sh is not None:
            return (sh["q"], sh["lse"])
        q_sh = arg_shapes[0].sharding
        if _passthrough_ok([q_sh]):
            return (q_sh, q_sh)
        rep = _replicated_like(q_sh)
        return (rep, rep)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[0].sharding
        sh = _fwd_shardings(mesh, q_sh)
        if sh is not None:
            args = (sh["q"], sh["kv"], sh["kv"], sh["seed"])
            outs = (sh["q"], sh["lse"])
        elif _passthrough_ok([a.sharding for a in arg_shapes[:3]]):
            seed_sh = arg_shapes[3].sharding
            args = (q_sh, q_sh, q_sh, seed_sh)
            outs = (q_sh, q_sh)
        else:
            rep = _replicated_like(q_sh)
            args = (rep,) * 4
            outs = (rep, rep)
        return mesh, impl, outs, args

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b h q d, b h k d, b h k d, s -> b h q d, b h r q",
    )
    return cp


@functools.lru_cache(maxsize=None)
def _make_bwd_cp(dropout_rate: float, kv_len: int):
    def impl(q, k, v, o, lse, do, seed_arr):
        return _bwd4(q, k, v, o, lse, do, seed_arr,
                     dropout_rate=dropout_rate, kv_len=kv_len)

    cp = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[0].sharding
        sh = _fwd_shardings(mesh, q_sh)
        if sh is not None:
            return (sh["q"], sh["kv"], sh["kv"])
        if _passthrough_ok([q_sh]):
            return (q_sh, arg_shapes[1].sharding, arg_shapes[2].sharding)
        rep = _replicated_like(q_sh)
        return (rep, rep, rep)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[0].sharding
        sh = _fwd_shardings(mesh, q_sh)
        if sh is not None:
            args = (sh["q"], sh["kv"], sh["kv"], sh["q"], sh["lse"],
                    sh["q"], sh["seed"])
            outs = (sh["q"], sh["kv"], sh["kv"])
            tq_axes = sh["tq_axes"]

            def lower_fn(q, k, v, o, lse, do, seed_arr):
                dq, dk, dv = impl(q, k, v, o, lse, do, seed_arr)
                if tq_axes:
                    # dk/dv from a query shard are partial sums
                    dk = jax.lax.psum(dk, tq_axes)
                    dv = jax.lax.psum(dv, tq_axes)
                return dq, dk, dv

            return mesh, lower_fn, outs, args
        if _passthrough_ok([a.sharding for a in arg_shapes[:6]]):
            k_sh, v_sh = arg_shapes[1].sharding, arg_shapes[2].sharding
            args = (q_sh, k_sh, v_sh, q_sh, arg_shapes[4].sharding, q_sh,
                    arg_shapes[6].sharding)
            outs = (q_sh, k_sh, v_sh)
            return mesh, impl, outs, args
        rep = _replicated_like(q_sh)
        return mesh, impl, (rep,) * 3, (rep,) * 7

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=("b h q d, b h k d, b h k d, b h q d, b h r q, "
                       "b h q d, s -> b h q d, b h k d, b h k d"),
    )
    return cp


# ---------------------------------------------------------------------------
# custom_vjp wrapper on the padded [B, H, T, D] layout

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, seed_arr, dropout_rate: float, kv_len: int):
    o, _ = _make_fwd_cp(dropout_rate, kv_len)(q, k, v, seed_arr)
    return o


def _flash_fwd_rule(q, k, v, seed_arr, dropout_rate, kv_len):
    o, lse = _make_fwd_cp(dropout_rate, kv_len)(q, k, v, seed_arr)
    # Offer the kernel outputs to rematerialization policies: under
    # per-layer nn.remat with save_only_these_names("flash_o", "flash_lse")
    # the backward reuses the saved (o, lse) instead of re-running the
    # forward kernel during recompute (q/k/v are rebuilt from the cheap
    # projection matmuls).  With no policy (or none matching) this is an
    # identity.  See configs.WhisperConfig.remat_policy.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse, seed_arr)


def _flash_bwd_rule(dropout_rate, kv_len, residuals, do):
    q, k, v, o, lse, seed_arr = residuals
    dq, dk, dv = _make_bwd_cp(dropout_rate, kv_len)(
        q, k, v, o, lse, do, seed_arr)
    # seed is integer-valued: its cotangent has dtype float0
    return dq, dk, dv, np.zeros(seed_arr.shape, dtype=jax.dtypes.float0)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _pad_to(x, length, axis):
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def padded_seq_len(t: int) -> int:
    """Smallest L >= t the flash kernel accepts with no internal padding.

    Callers (e.g. the Whisper encoder) can pad the sequence once at this
    length and pass `kv_len=t`, instead of paying a jnp.pad copy of q/k/v at
    every pallas call (3 per layer per direction at seq 1500 in round 1).
    """
    length = -(-t // 128) * 128
    while True:
        bq, bk = _block_sizes(length, length)
        if length % bq == 0 and length % bk == 0:
            return length
        length += 128


def flash_attention(
    query: jax.Array,   # [B, H, Tq, D], pre-scaled
    key: jax.Array,     # [B, H, Tk, D]
    value: jax.Array,
    bias: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    seed=0,             # python int or traced int32 scalar
    kv_len: Optional[int] = None,  # true KV length when key/value are padded
) -> jax.Array:
    """Flash attention entry point on the [B, H, T, D] layout.

    The B, H and Tq dims may carry GSPMD shardings (TP head sharding, SP
    query-row sharding, DP batch sharding) — the custom_partitioning wrappers
    above split the kernel accordingly; Tk and D are gathered."""
    assert bias is None, "flash path handles bias-free attention only"
    b, h, tq, d = query.shape
    tk = key.shape[2]
    if kv_len is None:
        kv_len = tk

    bq, bk = _block_sizes(tq, tk)
    tq_pad = -(-tq // bq) * bq
    tk_pad = -(-tk // bk) * bk
    q = _pad_to(query, tq_pad, 2)
    k = _pad_to(key, tk_pad, 2)
    v = _pad_to(value, tk_pad, 2)

    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)
    o = _flash(q, k, v, seed_arr, float(dropout_rate), int(kv_len))
    return o[:, :, :tq, :]
