"""Sequence-parallel (dp x seq) training over a 2-D mesh — extension.

The reference has neither model- nor sequence-parallelism (SURVEY §2.6,
§5.7).  This clearly-labeled extension shards the ENCODER TIME AXIS over a
('data', 'seq') mesh: Whisper's 1500-frame encoder activations — and the
[B, H, T, T] attention scores behind them — are the model's memory giant,
and sharding T is what lets long-audio / large-model configs span chips.

GSPMD style (the scaling-book recipe): a single sharding constraint at
every encoder layer boundary (`ops.sharding.seq_constrain`, called from the
Whisper encoder; this trainer installs the spec via the thread-local
`seq_axis_rules` context while tracing).  XLA then

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

Cross-replica aggregation keeps the REFERENCE semantics (round-3 fix; the
round-2 trainer silently switched to global-mean): the step body is
dp.make_train_step's replica step under a *partial-manual* shard_map —
'data' manual (SUM-of-replica-losses logging, optional hardened wav2vec2
chain), 'seq' GSPMD-auto (the time-axis sharding above).  A "replica" is
one sequence-parallel group, the analogue of the reference's one-GPU
worker.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tethys_tpu.ops.sharding import seq_axis_rules, seq_constrain  # noqa: F401  (re-export)
from tethys_tpu.parallel.dp import TrainState
from tethys_tpu.parallel.mesh import place_tree


def make_seq_mesh(num_devices: Optional[int] = None,
                  seq_parallel: int = 4) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"(platform={devices[0].platform if devices else 'none'})"
            )
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
    hardened: bool = False,
    return_aux: bool = False,
    grad_aux_fn: Optional[Callable[[Any], Any]] = None,
    grad_accum: int = 1,
):
    """Train step over the ('data', 'seq') mesh with the reference's
    aggregation semantics (see module doc).

    Params replicated; batch manual-sharded over 'data'; inside each
    replica body the encoder's [B_local, T, D] activations are constrained
    to P(None, 'seq', None) — 'seq' is the remaining GSPMD-auto axis, so
    XLA derives the sequence collectives.  The spec is installed via the
    thread-local `seq_axis_rules` context only while tracing (the jitted
    step retraces on new shapes inside the wrapper, so the context always
    covers tracing).
    """
    from tethys_tpu.parallel import dp as dp_lib

    jitted = dp_lib.make_train_step(
        loss_fn, optimizer, mesh,
        hardened=hardened,
        return_aux=return_aux,
        grad_aux_fn=grad_aux_fn,
        remat=remat,
        grad_accum=grad_accum,
    )
    # Batch dim is a LOCAL (per-data-replica) dim inside the manual region;
    # only the auto 'seq' axis appears in the activation spec.
    seq_spec = P(None, "seq", None)

    def wrapper(state, batch, rng):
        with seq_axis_rules(seq_spec):
            return jitted(state, batch, rng)

    wrapper.lower = lambda *a, **k: _lower_with_ctx(jitted, seq_spec, *a, **k)
    return wrapper


def _lower_with_ctx(jitted, seq_spec, *args, **kwargs):
    with seq_axis_rules(seq_spec):
        return jitted.lower(*args, **kwargs)


def init_sp_state(params: Any, optimizer: optax.GradientTransformation,
                  mesh: Mesh) -> TrainState:
    """Replicated params/opt state on the ('data', 'seq') mesh."""
    # optimizer.init runs on the host params so every leaf (moments AND
    # scalar counts) is a process-local value place_tree can materialize
    # shard-locally (see mesh.place_tree).
    sharding = NamedSharding(mesh, P())
    state = TrainState(params, optimizer.init(params))
    return place_tree(state, sharding)
