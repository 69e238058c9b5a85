"""Fused projection + head-split (and merge + projection) Pallas kernels.

The attention datapath around the flash kernel costs HBM round-trips that
XLA cannot remove: q/k/v projections write three [B, T, E] arrays which the
head-split immediately re-reads and re-writes as [B, H, T, d]; the output
side merges [B, H, T, d] back to [B, T, E] only for out_proj to re-read it.
(The reference computes the same projections and eager reshapes:
speech_jobs/whisper_dist.py:619-733.)

These kernels collapse each side into one pass over the activations:

* `project_split(x, [(kernel, bias, scale), ...])` — one kernel reads an
  [T_blk, E] tile of x once, runs it through ALL projection matrices (the
  [E, E] weights stay resident in VMEM across the whole grid), and writes
  each result directly as packed per-head [T_blk, d] slabs of a [B, H, T, d]
  output.  One x read + N slab writes replaces N× (x read + [B,T,E] write +
  re-read + slab write).
* `merge_project(attn, kernel, bias)` — reads [H, T_blk, d] slabs, contracts
  them against the [H, d, E]-reshaped out-projection weight (accumulating in
  f32 across heads), writes the final [T_blk, E] tile.  The [B, T, E] merged
  intermediate never exists in HBM.

Both carry custom VJPs.  Backward matmuls (dx, dW, db) are XLA dot_generals
contracting the (H, d) or (B, T) axes directly on the [B, H, T, d] layout —
no transpose materialization (grep 'einsum' below).

Weights must fit VMEM next to the tiles (E ≤ ~1280 at bf16 for 3 matrices —
covers whisper-large's 1280); `supported()` gates shapes, callers fall back
to plain Dense + split_heads (ops/pallas_transpose.py) elsewhere.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_INTERPRET = False  # tests flip this to exercise kernels off-TPU

# One grid step's VMEM: x tile + all weight matrices + all out tiles,
# doubled for Mosaic's double buffering (weights revisit block (0,0) every
# step, so in practice they are fetched once; budget conservatively anyway).
_MAX_TILE_BYTES = 6 * 1024 * 1024


def _on_tpu() -> bool:
    if _INTERPRET:
        return True
    from tethys_tpu.utils.device import target_platform

    return target_platform() == "tpu"


def _sublane(dtype) -> int:
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _tile_bytes(t_blk: int, e_in: int, e_out: int, num_heads: int,
                n_mats: int, dtype) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    head_dim = e_out // num_heads
    x_tile = t_blk * _pad128(e_in)
    w_tiles = n_mats * e_in * _pad128(e_out)
    out_tiles = n_mats * num_heads * t_blk * _pad128(head_dim)
    return (x_tile + w_tiles + out_tiles) * itemsize


def _choose_t_block(t: int, e_in: int, e_out: int, num_heads: int,
                    n_mats: int, dtype):
    if _tile_bytes(t, e_in, e_out, num_heads, n_mats, dtype) \
            <= _MAX_TILE_BYTES:
        return t
    step = _sublane(dtype)
    for t_blk in range(t // 2, step - 1, -1):
        if t % t_blk or t_blk % step:
            continue
        if _tile_bytes(t_blk, e_in, e_out, num_heads, n_mats, dtype) \
                <= _MAX_TILE_BYTES:
            return t_blk
    return None


def supported(t: int, e_in: int, e_out: int, num_heads: int,
              n_mats: int, dtype) -> bool:
    """Whether the fused path handles this shape on the current backend.

    OPT-IN (TETHYS_FUSED_QKV=1): the whole-step A/B on v5e measured the
    fused path ~4 ms/step SLOWER at whisper-base shapes (72.3/72.4 vs
    68.4 ms, two runs each — BASELINE.md round 4): the per-head slab
    writes pad head_dim 64 up to the 128-lane tile, and the kernel
    boundary forfeits XLA's overlap of the projection dots with the
    surrounding elementwise fusions.  Callers default to the
    identical-numerics dot + split_heads path (ops/pallas_transpose.py)."""
    import os

    if os.environ.get("TETHYS_FUSED_QKV", "0") != "1":
        return False
    if not _on_tpu():
        return False
    if e_out % num_heads:
        return False
    return _choose_t_block(t, e_in, e_out, num_heads, n_mats, dtype) \
        is not None


# ---------------------------------------------------------------------------
# project_split

def _proj_split_kernel(x_ref, *refs, num_heads: int, head_dim: int,
                       scales: Tuple[float, ...]):
    n = len(scales)
    x = x_ref[0]                                     # [T_blk, E_in]
    for m in range(n):
        w = refs[2 * m][...]                         # [E_in, E_out]
        b = refs[2 * m + 1][0]                       # [E_out]
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        y = (y.astype(x.dtype) + b) * scales[m]      # Dense adds bias in
        out = refs[2 * n + m]                        # compute dtype
        for h in range(num_heads):
            out[0, h] = y[:, h * head_dim:(h + 1) * head_dim]


def _project_split_call(x, kernels, biases, scales, num_heads):
    b, t, e_in = x.shape
    e_out = kernels[0].shape[1]
    head_dim = e_out // num_heads
    n = len(kernels)
    t_blk = _choose_t_block(t, e_in, e_out, num_heads, n, x.dtype)
    w_spec = pl.BlockSpec((e_in, e_out), lambda bi, i: (0, 0))
    b_spec = pl.BlockSpec((1, e_out), lambda bi, i: (0, 0))
    in_specs = [pl.BlockSpec((1, t_blk, e_in), lambda bi, i: (bi, i, 0))]
    operands = [x]
    for kern, bias in zip(kernels, biases):
        in_specs += [w_spec, b_spec]
        operands += [kern.astype(x.dtype), bias.astype(x.dtype)[None, :]]
    out_spec = pl.BlockSpec((1, num_heads, t_blk, head_dim),
                            lambda bi, i: (bi, 0, i, 0))
    out_shape = jax.ShapeDtypeStruct((b, num_heads, t, head_dim), x.dtype)
    return pl.pallas_call(
        functools.partial(_proj_split_kernel, num_heads=num_heads,
                          head_dim=head_dim, scales=tuple(scales)),
        grid=(b, t // t_blk),
        in_specs=in_specs,
        out_specs=[out_spec] * n,
        out_shape=[out_shape] * n,
        interpret=_INTERPRET,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _project_split(x, kernels, biases, scales, num_heads):
    return tuple(_project_split_call(x, kernels, biases, scales, num_heads))


def _project_split_fwd(x, kernels, biases, scales, num_heads):
    ys = _project_split_call(x, kernels, biases, scales, num_heads)
    return tuple(ys), (x, tuple(kernels), tuple(biases))


def _project_split_bwd(scales, num_heads, res, dys):
    # The cotangents arrive split ([B,H,T,d]); merge them through the FAST
    # pallas merge (ops/pallas_transpose.py) and run plain full-width XLA
    # matmuls — einsums contracting (h, f) in place lower to XLA generic
    # transposes, the exact slow path these kernels exist to avoid.
    from tethys_tpu.ops.pallas_transpose import merge_heads

    x, kernels, biases = res
    b, t, e_in = x.shape
    x2 = x.reshape(b * t, e_in)
    dx = None
    dks, dbs = [], []
    for kern, dy, scale, bias in zip(kernels, dys, scales, biases):
        dm = merge_heads(dy)                       # [B, T, E_out]
        if scale != 1.0:
            dm = dm * scale
        dm2 = dm.reshape(b * t, -1)
        term = jnp.dot(dm2, kern.astype(dm.dtype).T).reshape(b, t, e_in)
        dx = term if dx is None else dx + term
        dk = jnp.dot(x2.T, dm2, preferred_element_type=jnp.float32)
        dks.append(dk.astype(kern.dtype))
        # Cotangent dtypes must match the params (bf16 master params would
        # otherwise get f32 bias grads, retracing the donated step and
        # diverging from the unfused fallback's gradient dtypes).
        dbs.append(dm2.sum(axis=0).astype(bias.dtype))
    return dx, tuple(dks), tuple(dbs)


_project_split.defvjp(_project_split_fwd, _project_split_bwd)


def project_split(x: jax.Array,
                  projections: Sequence[Tuple[jax.Array, jax.Array, float]],
                  num_heads: int):
    """[(kernel [E_in,E_out], bias [E_out], scale)] → tuple of [B,H,T,d].

    Each output m is ((x @ kernel_m) + bias_m) * scale_m head-split to
    [B, num_heads, T, E_out/num_heads].  Falls back to the unfused
    dot + split_heads (same numerics contract) off-TPU or on unsupported
    shapes."""
    kernels = [p[0] for p in projections]
    biases = [p[1] for p in projections]
    scales = tuple(float(p[2]) for p in projections)
    t, e_in = x.shape[1], x.shape[2]
    e_out = kernels[0].shape[1]
    if supported(t, e_in, e_out, num_heads, len(kernels), x.dtype):
        return _project_split(x, tuple(kernels), tuple(biases), scales,
                              num_heads)
    if supported(t, e_in, e_out, num_heads, 1, x.dtype):
        # All matrices together exceed the tile budget (medium/large E):
        # one call per matrix — each re-reads x (cheap: x is the smallest
        # array here) but still never materializes the [B, T, E]
        # projection in HBM.
        return tuple(
            _project_split(x, (k,), (b,), (s,), num_heads)[0]
            for k, b, s in zip(kernels, biases, scales))
    from tethys_tpu.ops.pallas_transpose import split_heads

    outs = []
    for kern, bias, scale in zip(kernels, biases, scales):
        y = (jnp.dot(x, kern.astype(x.dtype)) + bias.astype(x.dtype)) * scale
        outs.append(split_heads(y, num_heads))
    return tuple(outs)


# ---------------------------------------------------------------------------
# merge_project

def _merge_proj_kernel(a_ref, w_ref, b_ref, o_ref, scratch_ref, *,
                       num_heads: int, head_dim: int):
    # In-register lane packing of the per-head slabs into one [T_blk, H*d]
    # scratch row (the proven _merge_kernel movement pattern), then ONE
    # full-width MXU matmul — per-head K=64 matmuls measured slower.
    for h in range(num_heads):
        scratch_ref[:, h * head_dim:(h + 1) * head_dim] = a_ref[0, h]
    y = jnp.dot(scratch_ref[...], w_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype) + b_ref[0]


def _merge_project_call(attn, kernel, bias):
    from jax.experimental.pallas import tpu as pltpu

    b, num_heads, t, head_dim = attn.shape
    e_out = kernel.shape[1]
    t_blk = _choose_t_block(t, num_heads * head_dim, e_out, num_heads, 1,
                            attn.dtype)
    return pl.pallas_call(
        functools.partial(_merge_proj_kernel, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(b, t // t_blk),
        in_specs=[
            pl.BlockSpec((1, num_heads, t_blk, head_dim),
                         lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((num_heads * head_dim, e_out),
                         lambda bi, i: (0, 0)),
            pl.BlockSpec((1, e_out), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_blk, e_out), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, e_out), attn.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_blk, num_heads * head_dim), attn.dtype)],
        interpret=_INTERPRET,
    )(attn, kernel.astype(attn.dtype), bias.astype(attn.dtype)[None, :])


@jax.custom_vjp
def _merge_project(attn, kernel, bias):
    return _merge_project_call(attn, kernel, bias)


def _merge_project_fwd(attn, kernel, bias):
    return _merge_project_call(attn, kernel, bias), (attn, kernel, bias)


def _merge_project_bwd(res, dy):
    # Same rationale as _project_split_bwd: fast pallas split/merge + plain
    # full-width matmuls instead of layout-forcing einsums.
    from tethys_tpu.ops.pallas_transpose import merge_heads, split_heads

    attn, kernel, bias = res
    b, num_heads, t, head_dim = attn.shape
    dmerged = jnp.dot(dy, kernel.astype(dy.dtype).T)     # [B, T, H*d]
    dattn = split_heads(dmerged, num_heads)
    am = merge_heads(attn).reshape(b * t, num_heads * head_dim)
    dk = jnp.dot(am.T, dy.reshape(b * t, -1),
                 preferred_element_type=jnp.float32)
    return (dattn, dk.astype(kernel.dtype),
            dy.sum(axis=(0, 1)).astype(bias.dtype))


_merge_project.defvjp(_merge_project_fwd, _merge_project_bwd)


def merge_project(attn: jax.Array, kernel: jax.Array,
                  bias: jax.Array) -> jax.Array:
    """[B,H,T,d] × [H*d, E] (+bias) → [B,T,E], merge fused into the matmul.

    Falls back to merge_heads + dot off-TPU / unsupported shapes."""
    b, num_heads, t, head_dim = attn.shape
    e_out = kernel.shape[1]
    if supported(t, num_heads * head_dim, e_out, num_heads, 1, attn.dtype):
        return _merge_project(attn, kernel, bias)
    from tethys_tpu.ops.pallas_transpose import merge_heads

    merged = merge_heads(attn)
    return jnp.dot(merged, kernel.astype(attn.dtype)) + bias.astype(attn.dtype)
