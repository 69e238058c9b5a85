"""Sequence-parallel (dp x seq) training over a 2-D mesh — extension.

The reference has neither model- nor sequence-parallelism (SURVEY §2.6,
§5.7).  This clearly-labeled extension shards the ENCODER TIME AXIS over a
('data', 'seq') mesh: Whisper's 1500-frame encoder activations — and the
[B, H, T, T] attention scores behind them — are the model's memory giant,
and sharding T is what lets long-audio / large-model configs span chips.

GSPMD style (the scaling-book recipe): a single sharding constraint at
every encoder layer boundary (`seq_constrain`, called from the Whisper
encoder when a sequence-parallel step is being traced).  XLA then

* partitions all elementwise / LayerNorm / FFN work along T,
* inserts halo exchanges for the conv stem,
* keeps each device's QUERY rows local in attention and gathers K/V across
  the 'seq' axis (all-gather on ICI) — each device computes its own
  [T/seq, T] score rows, so score memory also drops by the seq factor.

The pallas flash kernel composes with this mesh: it is an opaque custom
call GSPMD cannot split on its own, so `ops/pallas_attention.py` wraps it
in `jax.experimental.custom_partitioning` — query rows shard over 'seq'
(K/V gathered across the axis, dk/dv psum'd in the backward), heads over
'model', batch over 'data'.  Verified numerically equal to the unsharded
kernel for every trainer layout in `tests/test_flash_partition.py`.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tethys_tpu.parallel.dp import TrainState

# Sharding applied by `seq_constrain` while a sequence-parallel step is
# being traced; None -> no-op (every non-SP path).
_SEQ_SHARDING: Optional[NamedSharding] = None


def seq_constrain(x: jax.Array) -> jax.Array:
    """Layer-boundary hook the Whisper encoder calls on [B, T, D]
    activations.  No-op unless tracing under `make_sp_train_step`."""
    if _SEQ_SHARDING is None or x.ndim != 3:
        return x
    return jax.lax.with_sharding_constraint(x, _SEQ_SHARDING)


@contextlib.contextmanager
def _seq_ctx(sharding: NamedSharding):
    global _SEQ_SHARDING
    prev = _SEQ_SHARDING
    _SEQ_SHARDING = sharding
    try:
        yield
    finally:
        _SEQ_SHARDING = prev


def make_seq_mesh(num_devices: Optional[int] = None,
                  seq_parallel: int = 4) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % seq_parallel != 0:
        raise ValueError(f"{n} devices not divisible by seq={seq_parallel}")
    grid = np.asarray(devices).reshape(n // seq_parallel, seq_parallel)
    return Mesh(grid, ("data", "seq"))


def make_sp_train_step(
    loss_fn: Callable,                  # (params, batch, rng) -> (loss, aux)
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    remat: bool = False,
):
    """jit train step over the ('data', 'seq') mesh.

    Params replicated, batch sharded over 'data', encoder activations
    constrained to P('data', 'seq', None) at every layer boundary; XLA
    derives the collectives.  Loss aggregation is the global-batch mean
    (extension trainer, like tp.py — the reference SUM-logging contract
    belongs to dp.py).

    NOTE: the seq constraint is installed only while THIS wrapper traces;
    the jitted step retraces on new shapes inside the wrapper, so the
    context always covers tracing.
    """
    fn = loss_fn
    if remat:
        fn = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def step(state: TrainState, batch, rng):
        (loss, _aux), grads = jax.value_and_grad(
            lambda p: fn(p, batch, rng), has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt), loss

    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(None, batch_sharding, replicated),
        donate_argnums=(0,),
    )
    seq_sharding = NamedSharding(mesh, P("data", "seq", None))

    def wrapper(state, batch, rng):
        with _seq_ctx(seq_sharding):
            return jitted(state, batch, rng)

    wrapper.lower = lambda *a, **k: _lower_with_ctx(jitted, seq_sharding,
                                                    *a, **k)
    return wrapper


def _lower_with_ctx(jitted, seq_sharding, *args, **kwargs):
    with _seq_ctx(seq_sharding):
        return jitted.lower(*args, **kwargs)


def init_sp_state(params: Any, optimizer: optax.GradientTransformation,
                  mesh: Mesh) -> TrainState:
    """Replicated params/opt state on the ('data', 'seq') mesh."""
    sharding = NamedSharding(mesh, P())
    replicated = jax.device_put(params, sharding)
    return TrainState(replicated, jax.device_put(
        optimizer.init(replicated), sharding))
