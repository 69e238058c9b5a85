"""Fused dropout on the TPU hardware PRNG.

XLA lowers `jax.random.bernoulli` + `where` to a threefry keystream plus a
materialized mask — measured at ~20% of the wav2vec2 train step across the
~30 hidden-state dropouts.  This kernel draws bits from the on-core PRNG and
applies the mask in one pass; the backward regenerates the identical mask
from the (seed, block) coordinates instead of storing it (same trick as the
flash-attention kernel).

Semantics match tf/keras & flax dropout: P(drop) = rate, survivors scaled by
1/(1-rate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512
LANES = 128
_INTERPRET = False


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * 1000003)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    keep = bits >= threshold
    scale = 1.0 / (1.0 - rate)
    o_ref[:] = jnp.where(keep, x_ref[:] * scale, 0.0).astype(o_ref.dtype)


def _row_block(rows: int, cols: int) -> int:
    """Largest multiple-of-8 divisor of `rows` that keeps the f32 VMEM block
    under ~2 MB for `cols` lanes (cols rounded up to the 128-lane tile); 0
    when rows has no multiple-of-8 divisor (caller falls back)."""
    cols_pad = -(-cols // LANES) * LANES
    max_rows = max(8, (1 << 21) // (4 * cols_pad))
    best = 0
    for r in range(8, min(rows, max_rows) + 1, 8):
        if rows % r == 0:
            best = r
    return best


def _run(x2d, seed_arr, rate):
    kernel = functools.partial(_kernel, rate=rate)
    rows, cols = x2d.shape
    block_rows = _row_block(rows, cols)
    if not block_rows:
        # Callers (fused_dropout) pre-guard on _row_block; a non-dividing
        # fallback block here would leave the trailing rows of the pallas
        # output UNWRITTEN — garbage activations with no error.  Fail loud.
        raise ValueError(
            f"fused dropout needs a multiple-of-8 divisor of rows={rows}")
    grid = (rows // block_rows,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((block_rows, cols),
                                   lambda i, *_: (i, 0))],
            out_specs=pl.BlockSpec((block_rows, cols), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=_INTERPRET,
    )(seed_arr, x2d)


@functools.lru_cache(maxsize=None)
def _make_dropout_cp(rate: float):
    """GSPMD handler for the dropout kernel (it is an opaque custom call the
    partitioner cannot split).  Supported trainers never reach this under
    auto-sharding — `auto_axes_in_scope()` gates them onto the XLA path — so
    this is a correctness safety net: gather, run the globally-consistent
    kernel, let GSPMD re-shard.  Never fast-and-wrong."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(x2d, seed_arr):
        return _run(x2d, seed_arr, rate)

    cp = custom_partitioning(impl)

    def _replicated(sharding):
        from jax._src.sharding_impls import GSPMDSharding

        return GSPMDSharding.get_replicated(sharding._device_assignment)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        s = arg_shapes[0].sharding
        hlo = getattr(s, "_hlo_sharding", None)
        if hlo is None or hlo.is_replicated():
            return s
        spec = getattr(s, "spec", None)
        if spec is not None and mesh is not None and mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return NamedSharding(mesh, P())
        return _replicated(s)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        s = arg_shapes[0].sharding
        spec = getattr(s, "spec", None)
        if spec is not None and mesh is not None and mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
        else:
            rep = _replicated(s)
        return mesh, impl, rep, (rep, rep)

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="r c, s -> r c",
    )
    return cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout2d(x2d, seed_arr, rate: float):
    return _make_dropout_cp(rate)(x2d, seed_arr)


def _fwd(x2d, seed_arr, rate):
    return _make_dropout_cp(rate)(x2d, seed_arr), seed_arr


def _bwd(rate, seed_arr, g):
    # identical mask (same seed, same block partition — shapes are static,
    # and the partitioning is canonical: replicated under GSPMD)
    return _make_dropout_cp(rate)(g, seed_arr), np.zeros(
        seed_arr.shape, dtype=jax.dtypes.float0)


_dropout2d.defvjp(_fwd, _bwd)


def auto_axes_in_scope() -> bool:
    """True when tracing inside a mesh region with a multi-device non-Manual
    axis (e.g. the hardened trainer's auto 'model'/'seq' axis): GSPMD may
    shard the arrays there, so callers route dropout to the XLA
    `jax.random` path — whose values are sharding-invariant by design —
    instead of the layout-dependent pallas kernel."""
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 — no mesh machinery: plain eager/jit
        return False
    if not getattr(am, "axis_names", ()):
        return False
    try:
        from jax.sharding import AxisType

        return any(
            t != AxisType.Manual and am.shape[name] > 1
            for name, t in zip(am.axis_names, am.axis_types)
        )
    except Exception:  # noqa: BLE001 — API drift: be conservative
        return True


def seed_from_rng(rng: jax.Array) -> jax.Array:
    """Derive the int32 seed the on-core PRNG kernels take from a JAX key.

    Single home for the seed policy (31 random bits); used by the flash
    attention kernel, the XLA-path attention dropout, and module_dropout.
    """
    return jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)


def fused_dropout(x: jax.Array, rate: float, seed) -> jax.Array:
    """Dropout over an arbitrarily-shaped array (TPU PRNG, mask regenerated
    in backward).  `seed`: python int or traced int32 scalar.

    Round-3 layout fix: keep the array's own minor dim as the kernel's lane
    axis — `x.reshape(-1, last)` collapses only the leading dims, which is
    layout-preserving (free), where the old flatten-to-[N/128, 128] forced
    a physical relayout copy in AND out for every tensor whose minor dim
    isn't 128 (the [B,H,100,100] attention probs, [B,T,3072] FFN and
    [B,T,d_model] hidden states — profiled at ~1.8 ms/step of reshapes on
    wav2vec2-base).  Mosaic handles non-128-multiple lane dims by tiling
    (100 -> one padded 128-lane tile), matching the tensor's existing
    physical padding."""
    if rate <= 0.0:
        return x
    orig_shape = x.shape
    n = int(np.prod(orig_shape))
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)
    if x.ndim >= 2:
        last = orig_shape[-1]
        rows = n // last
        if _row_block(rows, last):
            out = _dropout2d(x.reshape(rows, last), seed_arr, float(rate))
            return out.reshape(orig_shape)
    cols = LANES
    rows = -(-n // cols)
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    flat = jnp.pad(x.reshape(-1), (0, rows_pad * cols - n))
    x2d = flat.reshape(rows_pad, cols)
    out = _dropout2d(x2d, seed_arr, float(rate))
    return out.reshape(-1)[:n].reshape(orig_shape)


def module_dropout(module, x: jax.Array, rate: float,
                   deterministic: bool) -> jax.Array:
    """flax-friendly dropout: fused TPU kernel when available, nn.Dropout
    fallback elsewhere (CPU tests).  Call from inside a module body."""
    if deterministic or rate <= 0.0:
        return x
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu and x.size >= 1 << 14 and not auto_axes_in_scope():
        return fused_dropout(x, rate, seed_from_rng(module.make_rng("dropout")))
    import flax.linen as nn

    return nn.Dropout(rate)(x, deterministic=False,
                            rng=module.make_rng("dropout"))
