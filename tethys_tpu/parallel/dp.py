"""Synchronous data-parallel train steps: jit + shard_map + psum over ICI.

This is the TPU-native equivalent of the reference's
MultiWorkerMirroredStrategy ring all-reduce path, reproducing its *exact*
aggregation semantics (SURVEY §2.6):

* plain step (Whisper, reference speech_jobs/whisper_dist.py:819-848):
  per-replica grads of the local mean loss are SUM-reduced across replicas
  (what Keras `optimizer.apply_gradients` does under MWMS), and the logged
  loss is the SUM of per-replica losses (`strategy.reduce(SUM)`).
* hardened step (Wav2Vec2, reference speech_jobs/wav2vec2_dist.py:1186-1260):
  NaN loss scrubbed to 0, loss scaled by 1/num_replicas, per-replica
  global-norm clip to 1.0 *before* the all-reduce, then the optimizer chain
  applies Keras-style per-variable clipnorm(1.0) + Adam(eps=1e-8) — the
  reference's double clipping, kept deliberately.

Replicated params + sharded batch means XLA lowers the `psum` onto ICI within
a slice (DCN across slices) with no NCCL/gRPC tuning surface.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tethys_tpu.parallel.mesh import place_tree


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


LossFn = Callable[[Any, Tuple[jax.Array, ...], jax.Array],
                  Tuple[jax.Array, Any]]


def per_variable_clipnorm(max_norm: float) -> optax.GradientTransformation:
    """Keras `Adam(clipnorm=...)` semantics: clip each gradient tensor by its
    own L2 norm (not the global norm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g.astype(jnp.float32) * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class KerasAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def keras_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """tf.keras.optimizers.Adam's EXACT update rule.

    Keras differs from optax.adam in epsilon placement: it folds the bias
    corrections into the step size and adds eps to the UNCORRECTED
    sqrt(v) —

        alpha_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        var    -= alpha_t * m / (sqrt(v) + eps)

    which is equivalent to m_hat / (sqrt(v_hat) + eps / sqrt(1 - b2^t)):
    an effective epsilon ~32x optax's at step 1, decaying toward eps.  The
    gap is tiny per step but COMPOUNDS — the 20-step trajectory-parity
    harness (tests/test_tf_trajectory_parity.py) measured 0.6% loss drift
    with optax.adam, 6x the <1e-3 north-star tolerance.  Moments live in
    the param dtype (same policy as optax.adam), so bf16-master capacity
    mode behaves identically."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)  # noqa: E731
        return KerasAdamState(jnp.zeros([], jnp.int32), zeros(), zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (g - m) * (1.0 - b1), state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (jnp.square(g) - v) * (1.0 - b2), state.nu,
            updates)
        c = count.astype(jnp.float32)
        alpha = learning_rate * jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (-alpha * m / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu, nu)
        return new_updates, KerasAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def whisper_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    """Adam with Keras defaults (eps=1e-7), Keras-exact epsilon placement —
    reference whisper_dist.py:894-901."""
    return keras_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


def wav2vec2_optimizer(learning_rate: float = 3e-5) -> optax.GradientTransformation:
    """clipnorm(1.0-per-variable) + Keras-exact Adam(eps=1e-8) — reference
    wav2vec2_dist.py:1271-1275."""
    return optax.chain(
        per_variable_clipnorm(1.0),
        keras_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
    )



def scan_grad_accum(vg_fn, params, batch, rng, grad_accum):
    """Gradient accumulation as ONE lax.scan over equal-size microbatches —
    the shared contract for the DP/TP/SP replica body and the PP tick
    (keeping the two in lockstep; they previously duplicated this block).

    vg_fn(params, microbatch, mb_rng) -> ((loss, aux), grads).  Every leaf
    of `batch` is reshaped [(N, lead/N, ...)]; chunk i runs with
    fold_in(rng, i).  Returns (mean_loss, mean_grads, aux-mean-over-chunks)
    — equal to the unaccumulated step when the loss is a per-sample mean.
    Raises when the leading dim is not divisible by grad_accum."""
    lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if lead % grad_accum:
        raise ValueError(
            f"per-replica batch {lead} is not divisible by "
            f"grad_accum={grad_accum}")
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape(
            (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]),
        batch)

    def accum_body(carry, xs):
        mb, i = xs
        (l, a), g = vg_fn(params, mb, jax.random.fold_in(rng, i))
        acc_l, acc_g = carry
        # Accumulate in f32 regardless of param dtype: under bf16 master
        # params a bf16 running sum rounds every add to ~8 mantissa bits
        # and the mean diverges from the unaccumulated step this function
        # promises to equal.  One cast back at the end.
        return (acc_l + l,
                jax.tree_util.tree_map(
                    lambda acc, x: acc + x.astype(jnp.float32), acc_g, g)), a

    zero_g = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    (sum_l, sum_g), auxs = jax.lax.scan(
        accum_body, (jnp.zeros((), jnp.float32), zero_g),
        (micro, jnp.arange(grad_accum)))
    mean_loss = sum_l / grad_accum
    grads = jax.tree_util.tree_map(
        lambda g, p: (g / grad_accum).astype(p.dtype), sum_g, params)
    aux = jax.tree_util.tree_map(lambda x: x.mean(0), auxs)
    return mean_loss, grads, aux


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    hardened: bool = False,
    axis: str = "data",
    return_aux: bool = False,
    grad_aux_fn: Optional[Callable[[Any], Any]] = None,
    flat_spec=None,
    remat: bool = False,
    param_constraint: Optional[Callable[[Any], Any]] = None,
    grad_accum: int = 1,
):
    """Build a jitted DP train step.

    loss_fn(params, batch, rng) -> (scalar loss, aux) computed on the
    per-replica batch shard.  Returns step(state, batch, rng) -> (state, loss)
    where `loss` follows the reference's logging aggregation (see module doc).

    With `return_aux=True` the step returns (state, loss, aux): the loss_fn
    aux pmean'd over replicas, plus `grad_aux_fn(summed_grads)` under key
    "grad_aux" if given (used by the tensorsize profiler for in-graph
    per-gradient value statistics).

    With `flat_spec` (a `parallel.flat.FlatSpec`), `state.params` is the
    flat f32 master vector and `optimizer` must be the matching flat
    optimizer (`flat.whisper_optimizer` / `flat.wav2vec2_optimizer`): the
    whole clip → psum → clip → Adam chain then runs as a few large 1-D ops
    and one collective instead of four tree passes over every tensor
    (see flat.py module docs).  loss_fn still receives the pytree.

    On a MULTI-AXIS mesh ((data, model) from tp.py, (data, seq) from
    sp.py), the shard_map is *partial-manual*: only `axis` is manual, the
    remaining axes stay auto — GSPMD keeps partitioning the model/sequence
    dims inside each replica body while the cross-replica aggregation keeps
    the exact reference semantics above.  `param_constraint` (e.g.
    tp.constrain_params) re-pins the auto-axis param shardings inside the
    body; `remat=True` wraps the loss in jax.checkpoint for large-model
    HBM fits.

    `grad_accum=N` (extension; the reference has no accumulation) splits
    each replica's batch into N equal microbatches and lax.scan-accumulates
    value_and_grad: per-replica loss and grads become the mean over
    microbatches (identical to the unaccumulated step when the loss is a
    per-sample mean; for token-mean losses with ragged padding it is the
    mean-of-means).  Dropout streams fold in the microbatch index; the
    hardened NaN scrub runs per microbatch, the per-replica clip once on
    the accumulated grads.  Pairs with config.remat_layers to fit large
    effective batches in HBM.
    """
    n_replicas = mesh.shape[axis]
    auto_axes = frozenset(mesh.axis_names) - {axis}

    if remat:
        unremat_loss_fn = loss_fn
        loss_fn = jax.checkpoint(
            unremat_loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    if flat_spec is not None:
        pytree_loss_fn = loss_fn

        def loss_fn(flat_params, batch, rng):  # noqa: F811
            return pytree_loss_fn(flat_spec.unflatten(flat_params), batch, rng)

        if grad_aux_fn is not None:
            pytree_grad_aux_fn = grad_aux_fn

            def grad_aux_fn(flat_grads):  # noqa: F811
                return pytree_grad_aux_fn(flat_spec.unflatten(flat_grads))

    def replica_step(state: TrainState, batch, rng):
        # Distinct dropout / sampling streams per replica.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if param_constraint is not None:
            state = TrainState(param_constraint(state.params),
                               state.opt_state)

        if hardened:
            def vg_fn(params, mb, mb_rng):
                def scaled_loss_fn(p):
                    loss, aux = loss_fn(p, mb, mb_rng)
                    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
                    return loss / n_replicas, aux

                return jax.value_and_grad(
                    scaled_loss_fn, has_aux=True)(params)
        else:
            def vg_fn(params, mb, mb_rng):
                return jax.value_and_grad(
                    lambda p: loss_fn(p, mb, mb_rng), has_aux=True)(params)

        if grad_accum > 1:
            local_loss, grads, aux = scan_grad_accum(
                vg_fn, state.params, batch, rng, grad_accum)
        else:
            (local_loss, aux), grads = vg_fn(state.params, batch, rng)
        if hardened:
            # Per-replica global-norm clip BEFORE aggregation (reference quirk).
            grads, _ = optax.clip_by_global_norm(1.0).update(
                grads, optax.EmptyState())

        grads = jax.lax.psum(grads, axis)  # MWMS aggregates with SUM
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        loss_out = jax.lax.psum(local_loss, axis)  # strategy.reduce(SUM)
        new_state = TrainState(new_params, new_opt_state)
        if not return_aux:
            return new_state, loss_out
        aux_out = jax.lax.pmean(aux, axis)
        if grad_aux_fn is not None:
            aux_out = dict(aux_out) if isinstance(aux_out, dict) else {"aux": aux_out}
            aux_out["grad_aux"] = grad_aux_fn(grads)
        return new_state, loss_out, aux_out

    out_specs = (P(), P(), P()) if return_aux else (P(), P())
    kwargs = {}
    if auto_axes:
        # Partial-manual: 'data' manual, remaining mesh axes stay GSPMD-auto.
        kwargs["axis_names"] = {axis}
    sharded = shard_map(
        replica_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=out_specs,
        check_vma=False,
        **kwargs,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params/opt_state replicated on every mesh device.

    Uses local shard materialization (mesh.place_tree, which see for
    the multi-process rationale)."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return place_tree(state, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch sharded along its leading axis.

    Single-process: `batch` is the global batch; device_put scatters it over
    the mesh.  Multi-process (jax.distributed initialized): each process
    passes its *local* portion (per-replica batch × local replica count) and
    the global array is assembled across processes — the analogue of the
    reference's `strategy.experimental_distribute_dataset` split
    (speech_jobs/whisper_dist.py:914).
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        sharding = jax.sharding.NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
