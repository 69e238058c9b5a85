"""Fused decode self-attention + KV-cache append as one Pallas kernel.

Why: the per-token serving decode is HBM-streaming-bound (BASELINE.md round-4
serving profile).  For the self-attention sublayer the unfused XLA step pays
the transposed [B, H, D, T_max] cache buffers THREE times per token:

  1. `dynamic_update_slice` at column `cache_index` — with T_max minor every
     (8, 128) vreg intersects the written column, so the in-place update is a
     read-modify-write of the ENTIRE buffer (read + write),
  2. the attention contraction then reads the updated buffer again.

That is 3x(k+v) bytes of traffic where the information content is one read
and one column.  This kernel fuses the append, the causal position mask, the
f32 softmax, and both contractions into a single pass: each (batch,) program
loads the [H, D, T] K/V slabs into VMEM once, merges the new column in
registers, writes the slabs back (the appended caches — aliased in-place over
the inputs), and computes the attention output from the same VMEM-resident
data — 2x(k+v) bytes, plus ~10 fewer op dispatches per layer inside the
128-iteration decode scan.

Numerics match `ops.attention.decode_attention` (f32 scores/softmax,
compute-dtype probs/output, positions > index masked) with the cache write of
`WhisperAttention`'s decode path (column write at `cache_index`, cast to the
buffer dtype).  Serving is deterministic — no dropout.

Reference anchor: the decode this accelerates implements the cached
generate() of speech_jobs/whisper_dist.py:636-709 (which rebuilt the full
prefix each token; the KV-cache design itself is the TPU-side redesign, see
models/whisper.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tethys_tpu.ops.masks import NEG_INF

_INTERPRET = False  # tests flip this to exercise the kernel off-TPU

# Kill switch for A/B measurement (scripts/bench_generate.py --no_fused_decode
# sets it); default ON — same-session whole-decode A/B on v5e measured 1.084x
# (24,709 vs 22,796 tokens/s/chip, BASELINE.md round 4).
_ENABLED = os.environ.get("TETHYS_FUSED_DECODE", "1") == "1"


def _on_tpu() -> bool:
    if _INTERPRET:
        return True
    from tethys_tpu.utils.device import target_platform

    return target_platform() == "tpu"


def fused_decode_active(query: jax.Array, k_buf: jax.Array) -> bool:
    """Whether decode_self_attention will take the fused pallas path.

    Requires: TPU (or interpret), single-token query, and K/V buffers whose
    per-batch [H, D, T] slab fits a conservative VMEM budget (double-buffered
    in+out pairs for k and v ~ 8x the slab bytes; 2 MB slabs keep the total
    under the ~16 MB scoped-vmem limit for every Whisper preset).
    """
    if not (_ENABLED and _on_tpu()):
        return False
    if query.shape[2] != 1:
        return False
    h, d, t = k_buf.shape[1:]
    slab_bytes = h * d * max(t, 128) * jnp.dtype(k_buf.dtype).itemsize
    return slab_bytes <= 2 * 1024 * 1024


def _kernel(idx_ref, q_ref, kn_ref, vn_ref, kb_ref, vb_ref,
            out_ref, ko_ref, vo_ref):
    idx = idx_ref[0]
    kb = kb_ref[0]                                   # [H, D, T]
    vb = vb_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 2) == idx
    # New token's K/V arrive [H, 1, D]; merge as column idx of the slabs.
    kb = jnp.where(col, jnp.swapaxes(kn_ref[0], 1, 2).astype(kb.dtype), kb)
    vb = jnp.where(col, jnp.swapaxes(vn_ref[0], 1, 2).astype(vb.dtype), vb)
    ko_ref[0] = kb
    vo_ref[0] = vb

    q = q_ref[0]                                     # [H, 1, D] (pre-scaled)
    scores = jax.lax.dot_general(
        q, kb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, 1, T]
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(pos <= idx, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
    out = jax.lax.dot_general(
        p, vb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, 1, D]
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_self(idx, query, k_new, v_new, k_buf, v_buf):
    """Raw kernel launch on (local-shard) shapes; idx is a [1] int32 array."""
    b, h, _, d = query.shape
    t = k_buf.shape[3]
    buf_spec = pl.BlockSpec((1, h, d, t), lambda i: (i, 0, 0, 0))
    tok_spec = pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # index
            tok_spec,                                # q
            tok_spec,                                # k_new
            tok_spec,                                # v_new
            buf_spec,                                # k_buf
            buf_spec,                                # v_buf
        ],
        out_specs=[tok_spec, buf_spec, buf_spec],
        out_shape=[
            jax.ShapeDtypeStruct(query.shape, query.dtype),
            jax.ShapeDtypeStruct(k_buf.shape, k_buf.dtype),
            jax.ShapeDtypeStruct(v_buf.shape, v_buf.dtype),
        ],
        # Buffers update in place (flattened input indices include the SMEM
        # scalar): k_buf -> k_out, v_buf -> v_out.  The decode scan carries
        # them, so XLA donates and the whole append is zero-copy.
        input_output_aliases={4: 1, 5: 2},
        interpret=_INTERPRET,
    )(idx, query, k_new, v_new, k_buf, v_buf)


def _fused_call(query, k_new, v_new, k_buf, v_buf, index):
    idx = jnp.asarray(index, jnp.int32).reshape(1)
    if jax.device_count() == 1:
        # Single device: skip the custom_partitioning wrapper so the
        # input_output_aliases zero-copy cache append sits directly under
        # XLA's copy-insertion (an extra custom-call boundary can defeat
        # the aliasing and silently re-add the cache-write traffic).
        return _pallas_self(idx, query, k_new, v_new, k_buf, v_buf)
    return _self_cp()(idx, query, k_new, v_new, k_buf, v_buf)


def _xla_reference(query, k_new, v_new, k_buf, v_buf, index):
    """The unfused composition (exactly WhisperAttention's decode path):
    column DUS appends + decode_attention with the position mask."""
    from tethys_tpu.ops.attention import decode_attention

    k_buf = jax.lax.dynamic_update_slice(
        k_buf, jnp.swapaxes(k_new, 2, 3).astype(k_buf.dtype),
        (0, 0, 0, index))
    v_buf = jax.lax.dynamic_update_slice(
        v_buf, jnp.swapaxes(v_new, 2, 3).astype(v_buf.dtype),
        (0, 0, 0, index))
    positions = jnp.arange(k_buf.shape[3])
    valid = positions <= index
    bias = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :]
    out = decode_attention(query, k_buf, v_buf, bias=bias)
    return out, k_buf, v_buf


# --------------------------------------------------------------------------
# int8-quantized cross-attention KV caches (opt-in serving extension).
#
# The decode profile is a pure HBM stream of the per-generate cross caches
# (whisper-base batch 16: ~300 MB/token of bf16 K/V — 0.37 ms of the 0.65
# ms/token total, at ~HBM peak).  Quantizing the caches to int8 with one f32
# scale per cache COLUMN (per encoder position, per head) halves those bytes.
# Math: k[d,t] = k8[d,t]*sk[t], so scores[t] = (q . k8[:,t]) * sk[t] — the
# scale folds in AFTER the contraction (one [1,Tk] multiply); likewise
# out[d] = sum_t p[t]*sv[t]*v8[d,t] folds sv into the probs.  int8 values
# round-trip exactly through bf16 (|x| <= 127), so the ONLY numeric delta vs
# the bf16 cache is the int8 rounding itself (<= scale/2 per element).
#
# Opt-in (TETHYS_KV_QUANT=int8 or WhisperConfig.kv_quant): greedy token
# streams can differ from the bf16 cache in rare near-tie argmax steps —
# measured numbers and the accuracy note live in BASELINE.md round 4.
# --------------------------------------------------------------------------


def quantize_kv_cols(x_t: jax.Array):
    """Per-column symmetric int8 quantization of a TRANSPOSED cache.

    x_t: [B, H, D, Tk] -> (x8 int8 [B, H, D, Tk], scale f32 [B, H, 1, Tk])
    with x ~= x8 * scale.  Runs once per generate() (XLA, not a kernel —
    it reads the freshly-projected cache while it is still hot)."""
    absmax = jnp.max(jnp.abs(x_t.astype(jnp.float32)), axis=2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    x8 = jnp.clip(jnp.round(x_t.astype(jnp.float32) / scale), -127, 127)
    return x8.astype(jnp.int8), scale


def _q8_cross_kernel(q_ref, k8_ref, sk_ref, v8_ref, sv_ref, out_ref,
                     *, kv_len: int):
    q = q_ref[0]                                     # [H, 1, D]
    k8 = k8_ref[0]                                   # [H, D, Tk]
    scores = jax.lax.dot_general(
        q, k8.astype(q.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, 1, Tk]
    scores = scores * sk_ref[0]
    t = k8.shape[-1]
    if kv_len < t:
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(pos < kv_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)       # f32 [H, 1, Tk]
    p = (p * sv_ref[0]).astype(out_ref.dtype)        # fold v scales in
    v8 = v8_ref[0]                                   # [H, D, Tk]
    out = jax.lax.dot_general(
        p, v8.astype(p.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, 1, D]
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_q8_cross(query, k8, sk, v8, sv, *, kv_len):
    """Raw kernel launch on (local-shard) shapes."""
    b, h, _, d = query.shape
    t = k8.shape[3]
    # One program per batch row ([H, D, Tk] slabs): at whisper-base decode
    # shapes a (B, H) grid of [D, Tk] slabs measured a whole-decode WASH —
    # 128 grid steps of ~0.2 ms DMA each pay more per-step overhead than
    # the halved bytes save.  (B,) keeps the DMAs ~1.6 MB.
    buf_spec = pl.BlockSpec((1, h, d, t), lambda i: (i, 0, 0, 0))
    scale_spec = pl.BlockSpec((1, h, 1, t), lambda i: (i, 0, 0, 0))
    tok_spec = pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_q8_cross_kernel, kv_len=kv_len),
        grid=(b,),
        in_specs=[tok_spec, buf_spec, scale_spec, buf_spec, scale_spec],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct(query.shape, query.dtype),
        interpret=_INTERPRET,
    )(query, k8, sk, v8, sv)


# Default ON since the round-5 ladder A/B: the plain XLA int8 einsum beats
# the pallas q8 kernel at base b16 (+2.8%) and medium b8 (+5%), ties at
# base b32, and trails it only at large b8 (-1.8%) — and it shards
# natively (no custom_partitioning rules) and compiles no Mosaic kernel
# per decode shape.  TETHYS_Q8_XLA=0 re-selects the pallas kernel.
_Q8_XLA = os.environ.get("TETHYS_Q8_XLA", "1") == "1"


def _q8_cross_call(query, k8, sk, v8, sv, kv_len):
    if _Q8_XLA:
        # Hand XLA the int8 einsum directly — it streams int8 from HBM
        # (half the bytes) and keeps its own cross-layer fusion/overlap,
        # which the pallas boundary forfeits.  Same math the non-TPU
        # fallback below uses.
        return _q8_xla_math(query, k8, sk, v8, sv, kv_len)
    if jax.device_count() == 1:
        return _pallas_q8_cross(query, k8, sk, v8, sv, kv_len=kv_len)
    return _q8_cp(kv_len)(query, k8, sk, v8, sv)


def _q8_xla_math(query, k8, sk, v8, sv, eff_len):
    t = k8.shape[3]
    scores = jnp.einsum(
        "bhqd,bhdk->bhqk", query.astype(jnp.float32),
        k8.astype(jnp.float32),
        preferred_element_type=jnp.float32) * sk
    if eff_len < t:
        pos = jnp.arange(t)[None, None, None, :]
        scores = jnp.where(pos < eff_len, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * sv
    out = jnp.einsum("bhqk,bhdk->bhqd", probs, v8.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(query.dtype)


def decode_cross_attention_q8(
    query: jax.Array,   # [B, H, 1, D] current token's query (pre-scaled)
    k8: jax.Array,      # [B, H, D, Tk] int8 transposed key cache
    sk: jax.Array,      # [B, H, 1, Tk] f32 per-column key scales
    v8: jax.Array,      # [B, H, D, Tk] int8 transposed value cache
    sv: jax.Array,      # [B, H, 1, Tk] f32 per-column value scales
    kv_len=None,        # static true Tk when the cache is padded
):
    """Cross-attention decode step against int8-quantized transposed caches.
    Same contraction order / f32 softmax as ops.attention.decode_attention
    applied to the dequantized caches.  Returns [B, H, 1, D]."""
    t = k8.shape[3]
    eff_len = t if kv_len is None else int(kv_len)
    if _on_tpu() and query.shape[2] == 1:
        return _q8_cross_call(query, k8, sk, v8, sv, eff_len)
    # XLA fallback: identical math, materialized.
    return _q8_xla_math(query, k8, sk, v8, sv, eff_len)


# ---------------------------------------------------------------------------
# GSPMD partitioning (jax.experimental.custom_partitioning)
#
# Serving composes with device meshes — DP shards the batch, TP shards heads
# (tests/test_tp.py pins TP-sharded generate token identity) — but the pallas
# calls above are opaque custom calls GSPMD cannot split on its own; without
# rules the partitioner would gather the full caches to every device each
# decode step.  Both kernels are embarrassingly parallel over (batch, head):
# each program touches only its own [D, T] slabs and the softmax reduces over
# the UNSHARDED cache-length axis.  So the rules mirror the flash wrappers in
# ops/pallas_attention.py: dims {0, 1} shard straight through, anything else
# is force-gathered (full replication — correct, never fast-and-wrong).  The
# in-place cache aliasing is per-shard, so the zero-copy append survives
# partitioning.


def _bh_shardings(mesh, q_sharding):
    """NamedSharding path: propagate q's (batch, head) spec entries to every
    rank-4 operand/result; None when no usable spec (GSPMDSharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tethys_tpu.ops.pallas_attention import _spec4

    spec = _spec4(q_sharding)
    if spec is None or mesh is None or not getattr(mesh, "axis_names", ()):
        return None
    return dict(
        arr=NamedSharding(mesh, P(spec[0], spec[1], None, None)),
        scalar=NamedSharding(mesh, P(None)),
    )


def _bh_passthrough_ok(shardings):
    """GSPMDSharding path: partitionable iff only dims {0, 1} are split."""
    from tethys_tpu.ops.pallas_attention import _hlo_sharded_dims

    return all(set(_hlo_sharded_dims(s, 4)) <= {0, 1} for s in shardings)


@functools.lru_cache(maxsize=None)
def _self_cp():
    from jax.experimental.custom_partitioning import custom_partitioning

    from tethys_tpu.ops.pallas_attention import _replicated_like

    cp = custom_partitioning(_pallas_self)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[1].sharding
        sh = _bh_shardings(mesh, q_sh)
        if sh is not None:
            return (sh["arr"],) * 3
        if _bh_passthrough_ok([a.sharding for a in arg_shapes[1:]]):
            return (q_sh, q_sh, q_sh)
        rep = _replicated_like(q_sh)
        return (rep, rep, rep)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[1].sharding
        sh = _bh_shardings(mesh, q_sh)
        if sh is not None:
            args = (sh["scalar"],) + (sh["arr"],) * 5
            outs = (sh["arr"],) * 3
        elif _bh_passthrough_ok([a.sharding for a in arg_shapes[1:]]):
            # All rank-4 operands are forced onto q's (dims {0,1}-only)
            # sharding — mirrors _make_fwd_cp.  Passing each operand's own
            # sharding through would accept mixed layouts (q batch-sharded,
            # caches replicated/head-sharded) whose mismatched local shapes
            # feed _pallas_self a grid sized by q against differently-sized
            # cache slabs.  Resharding to q_sh is a no-op when layouts
            # already match and a corrective reshard when they don't.
            args = (arg_shapes[0].sharding,) + (q_sh,) * 5
            outs = (q_sh, q_sh, q_sh)
        else:
            rep = _replicated_like(q_sh)
            args = (rep,) * 6
            outs = (rep,) * 3
        return mesh, _pallas_self, outs, args

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="s, b h u e, b h u e, b h u e, b h e t, b h e t "
                      "-> b h u e, b h e t, b h e t",
    )
    return cp


@functools.lru_cache(maxsize=None)
def _q8_cp(kv_len: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    from tethys_tpu.ops.pallas_attention import _replicated_like

    def impl(query, k8, sk, v8, sv):
        # A plain positional closure: custom_partitioning cannot resolve
        # functools.partial keyword arguments to positions.
        return _pallas_q8_cross(query, k8, sk, v8, sv, kv_len=kv_len)

    cp = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[0].sharding
        sh = _bh_shardings(mesh, q_sh)
        if sh is not None:
            return sh["arr"]
        if _bh_passthrough_ok([a.sharding for a in arg_shapes]):
            return q_sh
        return _replicated_like(q_sh)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = arg_shapes[0].sharding
        sh = _bh_shardings(mesh, q_sh)
        if sh is not None:
            args = (sh["arr"],) * 5
            outs = sh["arr"]
        elif _bh_passthrough_ok([a.sharding for a in arg_shapes]):
            # Force every operand onto q's sharding (see _self_cp) so mixed
            # per-operand layouts cannot reach the kernel with mismatched
            # local shapes.
            args = (q_sh,) * 5
            outs = q_sh
        else:
            rep = _replicated_like(q_sh)
            args = (rep,) * 5
            outs = rep
        return mesh, impl, outs, args

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b h u e, b h e t, b h u t, b h e t, b h u t "
                      "-> b h u e",
    )
    return cp


def decode_self_attention(
    query: jax.Array,   # [B, H, 1, D] current token's query (pre-scaled)
    k_new: jax.Array,   # [B, H, 1, D] current token's key
    v_new: jax.Array,   # [B, H, 1, D] current token's value
    k_buf: jax.Array,   # [B, H, D, T_max] TRANSPOSED key cache
    v_buf: jax.Array,   # [B, H, D, T_max] TRANSPOSED value cache
    index,              # scalar int32 write/attend position
):
    """Append (k_new, v_new) at cache column `index` and attend the query to
    positions <= index.  Returns (attn_out [B, H, 1, D], k_buf', v_buf')."""
    if fused_decode_active(query, k_buf):
        return _fused_call(query, k_new, v_new, k_buf, v_buf, index)
    return _xla_reference(query, k_new, v_new, k_buf, v_buf, index)
