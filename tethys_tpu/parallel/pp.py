"""Pipeline-parallel (dp x stage) Whisper training — extension.

The reference has data parallelism only (SURVEY §2.6); this clearly-labeled
extension adds the fourth mesh axis family: a GPipe-style pipeline over a
('data', 'stage') mesh for the Whisper ENCODER stack (the FLOPs giant at
n_ctx=1500).  TPU-idiomatic: the whole fill-drain schedule is ONE jitted
program — a fully-manual `shard_map` where each stage device holds its
[L/S, ...]-stacked slice of the encoder layer params, activations hop
stages via `jax.lax.ppermute` on ICI, and `lax.scan` walks the
M + S - 1 pipeline ticks.  Autodiff runs THROUGH the schedule: ppermute's
transpose is the reversed permutation, so backward activations hop the
ring in reverse and every weight gradient lands on the stage that owns the
weight.

Layout / gradient contract (kept deliberately simple and testable):

* params are packed as {"other": <everything but encoder layers>,
  "stack": <encoder layers stacked on a leading [L] dim>}; "stack" is
  sharded P('stage') on dim 0, "other" replicated.
* the conv stem runs (redundantly) on every stage but only stage 0's copy
  feeds the pipeline; the decoder + final LN + loss run (redundantly) on
  every stage but the loss is MASKED to the last stage — so after
  backward, each replicated param's true gradient lives on exactly ONE
  stage (stem on stage 0 via the reversed ppermutes, decoder/final-LN/
  lm_head on stage S-1) with zeros elsewhere, and a single
  `psum(grads["other"], 'stage')` replicates them all.  No gradient ever
  differentiates through a cross-stage psum (only through ppermute, whose
  transpose is exact) — avoiding the check_vma=False psum-transpose
  double-count pitfall.
* cross-replica aggregation keeps the reference semantics (SUM of
  per-data-replica mean losses, grads psum'd over 'data'), matching
  dp.make_train_step's plain step — the scraped stdout loss line means
  the same thing with or without --pp.

Microbatch dropout streams are folded per (global layer, tick) so the
masks differ from the DP step's (documented deviation; equality tests run
deterministic).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tethys_tpu.configs import WhisperConfig
from tethys_tpu.ops.activations import gelu
from tethys_tpu.ops.attention import flash_active
from tethys_tpu.ops.posenc import sinusoidal_table
from tethys_tpu.parallel.dp import TrainState
from tethys_tpu.parallel import dp
from tethys_tpu.parallel.mesh import place_tree


def make_pp_mesh(num_devices: Optional[int] = None,
                 pipeline_parallel: int = 2) -> Mesh:
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
    if n % pipeline_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by pp={pipeline_parallel}")
    grid = np.asarray(devices).reshape(n // pipeline_parallel,
                                       pipeline_parallel)
    return Mesh(grid, ("data", "stage"))


def pack_params(params: Any, num_layers: int) -> Any:
    """{"other": params minus encoder layers, "stack": [L, ...] layers}.

    tree_map(identity) rebuilds every container fresh (so the pops below
    never mutate the caller's tree) while SHARING the leaf buffers — a
    deepcopy here would device-copy every weight, transiently doubling
    param memory at exactly the medium/large scales PP exists for."""
    other = jax.tree_util.tree_map(lambda x: x, params)
    enc = other["model"]["encoder"]
    layers = [enc.pop(f"layers_{i}") for i in range(num_layers)]
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {"other": other, "stack": stack}


def unpack_params(packed: Any, num_layers: int) -> Any:
    """Inverse of pack_params (for final-weights saves / interop)."""
    params = jax.tree_util.tree_map(lambda x: x, packed["other"])
    enc = params["model"]["encoder"]
    for i in range(num_layers):
        enc[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda x: x[i], packed["stack"])
    return params


def gather_unpacked_params(packed: Any, num_layers: int, mesh: Mesh) -> Any:
    """Replicate the (stage-sharded, possibly cross-process) packed params
    and return the canonical layers_{i} tree on host.

    A bare `jax.device_get` raises on multi-process meshes — other stages'
    shards are non-addressable from this process.  The jitted identity
    with replicated out_shardings is the supported cross-process
    all-gather; on a single-process mesh it degenerates to a cheap copy."""
    reps = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), packed)
    replicated = jax.jit(lambda t: t, out_shardings=reps)(packed)
    return unpack_params(jax.device_get(replicated), num_layers)


def _state_specs(state: Any):
    def spec(path, leaf):
        del leaf
        names = [str(getattr(k, "key", k)) for k in path]
        return P("stage") if "stack" in names else P()

    return jax.tree_util.tree_map_with_path(spec, state)


def init_pp_state(params: Any, optimizer: optax.GradientTransformation,
                  mesh: Mesh, config: WhisperConfig) -> TrainState:
    """Pack + place: layer stack sharded over 'stage', rest replicated.
    Adam moments inherit the shardings through optimizer.init."""
    packed = pack_params(params, config.encoder_layers)
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            P("stage") if "stack" in [str(getattr(k, "key", k))
                                      for k in path] else P()),
        packed)
    # Local shard materialization (see mesh.place_tree).
    placed = place_tree(packed, shardings)
    return TrainState(placed, optimizer.init(placed))


def make_pp_train_step(
    model,                       # WhisperForConditionalGeneration
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,           # for the in/out spec pytrees only
    num_microbatches: int = 2,
    remat: bool = False,
    deterministic: bool = False,
    grad_accum: int = 1,
):
    """jit train step over the ('data', 'stage') mesh (see module doc).

    `grad_accum=N` scan-accumulates N accumulation chunks per step, each
    chunk running the full fill-drain pipeline schedule (so the local batch
    must divide by grad_accum x num_microbatches); per-replica loss and
    grads are the mean over chunks — the same contract as
    dp.make_train_step(grad_accum=N).  Dropout streams fold in the chunk
    index; with grad_accum=1 the rng streams (and hence numerics) are
    identical to the unaccumulated step."""
    from tethys_tpu.models.whisper import (
        DenseInit, WhisperEncoderLayer,
    )

    cfg = model.config
    S = mesh.shape["stage"]
    L = cfg.encoder_layers
    if L % S != 0:
        raise ValueError(f"{L} encoder layers not divisible by {S} stages")
    per_stage = L // S
    M = num_microbatches
    layer_mod = WhisperEncoderLayer(cfg)

    conv1 = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(1,),
                    padding="SAME", dtype=cfg.dtype, kernel_init=DenseInit)
    conv2 = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(2,),
                    padding="SAME", dtype=cfg.dtype, kernel_init=DenseInit)
    final_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype)

    def stem(other, features, rng):
        """Mirror of WhisperEncoder's pre-layer stage (models/whisper.py):
        conv stem + posenc + dropout + the one-time flash pad."""
        enc_p = other["model"]["encoder"]
        x = features.transpose(0, 2, 1).astype(cfg.dtype)
        x = gelu(conv1.apply({"params": enc_p["conv1"]}, x))
        x = gelu(conv2.apply({"params": enc_p["conv2"]}, x))
        pe = jnp.asarray(sinusoidal_table(cfg.n_ctx, cfg.d_model))
        x = x + pe[None, : x.shape[1], :].astype(cfg.dtype)
        if not deterministic and cfg.dropout > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0).astype(x.dtype)
        true_len = x.shape[1]
        pad_len = true_len
        if flash_active(cfg.use_flash_attention, true_len, true_len):
            from tethys_tpu.ops.pallas_attention import padded_seq_len

            pad_len = padded_seq_len(true_len)
            if pad_len != true_len:
                x = jnp.pad(x, ((0, 0), (0, pad_len - true_len), (0, 0)))
        kv_len = true_len if pad_len != true_len else None
        return x, kv_len, true_len

    def replica_step(state: TrainState, batch, rng):
        features, labels = batch
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        stage = jax.lax.axis_index("stage")
        perm = [(i, (i + 1) % S) for i in range(S)]

        def loss_fn(params, features, labels, chunk_rng):
            other, stack = params["other"], params["stack"]
            r_stem, r_layers, r_dec = jax.random.split(chunk_rng, 3)
            x0, kv_len, true_len = stem(other, features, r_stem)
            b_local = x0.shape[0]
            if b_local % M != 0:
                raise ValueError(
                    f"local batch {b_local} not divisible by "
                    f"num_microbatches={M}")
            micro = x0.reshape(M, b_local // M, *x0.shape[1:])

            def layer_chain(x, tick):
                def body(x, inp):
                    lp, li = inp
                    r = jax.random.fold_in(
                        jax.random.fold_in(r_layers,
                                           stage * per_stage + li), tick)
                    y = layer_mod.apply(
                        {"params": lp}, x, deterministic=deterministic,
                        kv_len=kv_len, rngs={"dropout": r})
                    return y, None

                fn = jax.checkpoint(body) if remat else body
                x, _ = jax.lax.scan(fn, x, (stack, jnp.arange(per_stage)))
                return x

            def tick_fn(carry, t):
                buf, out_buf = carry
                mb = jnp.clip(t, 0, M - 1)
                x_in = jnp.where(
                    stage == 0,
                    jax.lax.dynamic_index_in_dim(micro, mb, 0,
                                                 keepdims=False),
                    buf)
                y = layer_chain(x_in, t)
                out_idx = jnp.clip(t - (S - 1), 0, M - 1)
                updated = jax.lax.dynamic_update_index_in_dim(
                    out_buf, y, out_idx, 0)
                write = (t >= S - 1) & (stage == S - 1)
                out_buf = jnp.where(write, updated, out_buf)
                buf = jax.lax.ppermute(y, "stage", perm)
                return (buf, out_buf), None

            carry0 = (jnp.zeros_like(micro[0]), jnp.zeros_like(micro))
            (_, out_buf), _ = jax.lax.scan(
                tick_fn, carry0, jnp.arange(M + S - 1))

            enc = out_buf.reshape(b_local, *x0.shape[1:])
            enc = final_ln.apply(
                {"params": other["model"]["encoder"]["layer_norm"]}, enc)
            enc = enc[:, :true_len]
            out = model.apply(
                {"params": other}, None, encoder_outputs=enc, labels=labels,
                deterministic=deterministic, rngs={"dropout": r_dec})
            # Real activations only reach the decoder on the LAST stage;
            # mask the (finite-garbage) losses elsewhere so each replicated
            # param's gradient lands on exactly one stage (module doc).
            return jnp.where(stage == S - 1, out["loss"], 0.0), {}

        def vg(params, feats, labs, chunk_rng):
            return jax.value_and_grad(
                lambda p: loss_fn(p, feats, labs, chunk_rng),
                has_aux=True)(params)

        if grad_accum > 1:
            # Mean over equal-size chunks — dp.make_train_step's shared
            # accumulation contract (dp.scan_grad_accum).
            local_loss, grads, _ = dp.scan_grad_accum(
                lambda p, mb, r: vg(p, mb[0], mb[1], r),
                state.params, (features, labels), rng, grad_accum)
        else:
            (local_loss, _), grads = vg(state.params, features, labels, rng)
        grads = {"other": jax.lax.psum(grads["other"], "stage"),
                 "stack": grads["stack"]}
        grads = jax.lax.psum(grads, "data")     # MWMS aggregates with SUM
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        # stage-psum recovers the per-replica loss from the mask; data-psum
        # is the reference SUM-of-replica-losses logging contract.
        loss_out = jax.lax.psum(jax.lax.psum(local_loss, "stage"), "data")
        return TrainState(new_params, new_opt), loss_out

    specs = _state_specs(state)
    sharded = shard_map(
        replica_step,
        mesh=mesh,
        in_specs=(specs, P("data"), P()),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
