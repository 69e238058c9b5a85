"""Shared job assembly: model + optimizer + data + DP step + loop.

The reference repeats this glue in six ~1-2 kLoC monoliths (SURVEY §0); here
it lives once and the `jobs/*.py` entry points are thin argparse wrappers that
keep the reference CLIs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from tethys_tpu import data as data_lib
from tethys_tpu.checkpoint import CheckpointManager, save_final_weights
from tethys_tpu.models import whisper as whisper_lib
from tethys_tpu.models import wav2vec2 as wav2vec2_lib
from tethys_tpu.parallel import dp, mesh as mesh_lib
from tethys_tpu.train.loop import run_training, TrainLoopResult


def _init_whisper(model, config, rng):
    from tethys_tpu.utils.device import host_cpu_context

    features = jnp.zeros((1, config.n_mels, 16), dtype=jnp.float32)
    decoder_ids = jnp.zeros((1, 4), dtype=jnp.int32)
    with host_cpu_context():  # init is tiny; avoid a slow TPU compile+run
        variables = model.init(
            {"params": rng, "dropout": rng},
            features, decoder_input_ids=decoder_ids, deterministic=True,
        )
    return variables["params"]


def _init_wav2vec2(model, config, rng, model_kind: str):
    audio = jnp.zeros((1, 2000), dtype=jnp.float32)
    # deterministic=True: init may run on host CPU where the fused dropout
    # kernel cannot lower; dropout plays no role in shape/param creation.
    kwargs = {"training": True, "deterministic": True}
    if model_kind in ("asr", "classification"):
        labels = (
            jnp.zeros((1, 4), dtype=jnp.int32)
            if model_kind == "asr"
            else jnp.zeros((1,), dtype=jnp.int32)
        )
        kwargs["labels"] = labels
    from tethys_tpu.utils.device import host_cpu_context

    with host_cpu_context():
        variables = model.init({"params": rng, "dropout": rng}, audio,
                               **kwargs)
    return variables["params"]


def _maybe_start_monitor_bridge(step_hooks: tuple):
    """Start the chip-monitor metrics publisher unless TETHYS_MONITOR=0.

    The bridge feeds the native tpu_monitor daemon (see
    tethys_tpu/monitor/bridge.py); its note_step hook supplies the
    duty-cycle utilization signal.
    """
    import os

    if os.environ.get("TETHYS_MONITOR", "1") == "0":
        return step_hooks, None
    try:
        from tethys_tpu.monitor.bridge import MonitorBridge

        bridge = MonitorBridge().start()
        return tuple(step_hooks) + (bridge.note_step,), bridge
    except Exception as e:  # noqa: BLE001 — monitoring must never block training
        print(f"monitor bridge unavailable: {e}")
        return step_hooks, None


def _emit_collective_report(step_fn, state, batch_avals, rng) -> None:
    """AOT-compile the train step once and write the analytic ICI
    collective-byte accounting (`<task>_<idx>_collectives.txt`, next to the
    JCT file).

    TPU-native replacement for the reference's tcpdump capture
    (reference network.sh:1-9): the gradient all-reduce rides ICI, invisible
    to the host NIC, so bytes are summed from the compiled HLO instead.  The
    AOT compile shares the persistent compile cache with the first real step,
    so steady-state cost is one compile either way.
    """
    try:
        from tethys_tpu.parallel.mesh import job_identity
        from tethys_tpu.profiling.hlo_comm import write_collective_report

        hlo = step_fn.lower(state, batch_avals, rng).compile().as_text()
        task_type, task_index = job_identity()
        path = write_collective_report(hlo, task_type, task_index)
        if path:
            print(f"collective report: {path}")
    except Exception as e:  # noqa: BLE001 — observability must not kill jobs
        print(f"collective report failed: {e}")


def _batch_aval(shape, dtype, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P("data", *([None] * (len(shape) - 1)))
    return jax.ShapeDtypeStruct(shape, dtype,
                                sharding=NamedSharding(mesh, spec))


def _profiler_hooks(profiler, static_inventories, flavor: str):
    """Build the per-step hook that drives the TensorProfiler.

    Byte accounting is static (shapes don't change under jit), so each step
    logs the precomputed inventory; dynamic value-skew scalars arrive through
    the step's aux output.
    """

    def hook(step, loss, duration, aux):
        profiler.start_step(step)
        for inventory, tensor_type in static_inventories:
            profiler.log_inventory(inventory, tensor_type)
        if aux:
            skews = {}
            for key, val in aux.items():
                if key == "grad_aux" and isinstance(val, dict):
                    skews.update({k: float(v) for k, v in val.items()})
                elif key == "value_skews" and isinstance(val, dict):
                    skews.update({k: float(v) for k, v in val.items()})
            if skews:
                profiler.log_value_skews(skews)
        profiler.log_memory_usage()
        profiler.end_step()

    return hook


def train_whisper(
    model_type: str = "small",
    batch_size_per_replica: int = 1,
    num_batches: int = 40,
    num_epochs: int = 1,
    learning_rate: float = 1e-4,
    mesh=None,
    compute_dtype: str = "float32",
    seed: int = 42,
    checkpointing: bool = True,
    checkpoint_dir: Optional[str] = None,
    data_seq_len: int = 3000,
    step_hooks: tuple = (),
    loss_fn_wrapper: Optional[Callable] = None,
    config_overrides: Optional[dict] = None,
    profiler=None,
    resume: bool = False,
    collective_report: bool = False,
    tensor_parallel: int = 1,
    seq_parallel: int = 1,
    pipeline_parallel: int = 1,
    num_microbatches: int = 2,
    remat: bool = False,
    grad_accum: int = 1,
    master_dtype: str = "float32",
):
    """End-to-end Whisper training job (reference train_whisper,
    speech_jobs/whisper_dist.py:894-958).  With `profiler` set, adds the
    tensorsize instrumentation of whisper_dist_tensorsize.py (per-layer
    activation census via capture_intermediates, gradient/parameter sizes,
    memory sampling).

    `tensor_parallel > 1` trains over a 2-D (data, model) mesh with
    Megatron-style param shardings; `seq_parallel > 1` over a (data, seq)
    mesh with the encoder time axis sharded; `pipeline_parallel > 1` over
    a (data, stage) mesh with the encoder layer stack GPipe-pipelined
    across stages (all extensions — the reference has data parallelism
    only, SURVEY §2.6); `remat` checkpoints the forward for
    medium/large-model HBM fits; `grad_accum` scan-accumulates N
    microbatches per step (see dp.make_train_step);
    `master_dtype="bfloat16"` stores master params (and hence Adam
    moments) in bf16 — the single-chip capacity mode for medium/large
    (quarters optimizer HBM; same trade tp.init_tp_state offers via
    param_dtype)."""
    if sum(p > 1 for p in
           (tensor_parallel, seq_parallel, pipeline_parallel)) > 1:
        raise ValueError(
            "tensor_parallel / seq_parallel / pipeline_parallel are "
            "mutually exclusive")
    if tensor_parallel > 1:
        from tethys_tpu.parallel import tp as tp_lib

        mesh = mesh or tp_lib.make_2d_mesh(model_parallel=tensor_parallel)
    elif seq_parallel > 1:
        from tethys_tpu.parallel import sp as sp_lib

        mesh = mesh or sp_lib.make_seq_mesh(seq_parallel=seq_parallel)
    elif pipeline_parallel > 1:
        from tethys_tpu.parallel import pp as pp_lib

        mesh = mesh or pp_lib.make_pp_mesh(
            pipeline_parallel=pipeline_parallel)
    else:
        mesh = mesh or mesh_lib.make_data_mesh()
    # Multi-process: each process feeds only its local shard of the global
    # batch (dp.shard_batch assembles the global array across processes).
    model_par = (dict(mesh.shape).get("model", 1)
                 * dict(mesh.shape).get("seq", 1)
                 * dict(mesh.shape).get("stage", 1))
    data_batch = batch_size_per_replica * max(
        len(mesh.local_devices) // model_par, 1)

    model, config = whisper_lib.create_whisper_model(
        model_type, compute_dtype=compute_dtype, **(config_overrides or {})
    )
    rng = jax.random.PRNGKey(seed)
    params = _init_whisper(model, config, rng)
    if master_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
    optimizer = dp.whisper_optimizer(learning_rate)
    if tensor_parallel > 1:
        state = tp_lib.init_tp_state(params, optimizer, mesh)
    elif seq_parallel > 1:
        state = sp_lib.init_sp_state(params, optimizer, mesh)
    elif pipeline_parallel > 1:
        state = pp_lib.init_pp_state(params, optimizer, mesh, config)
    else:
        state = dp.TrainState(params, optimizer.init(params))
        state = dp.replicate_state(state, mesh)

    def loss_fn(params, batch, step_rng):
        features, labels = batch
        outputs = model.apply(
            {"params": params}, features, labels=labels,
            deterministic=False, rngs={"dropout": step_rng},
        )
        return outputs["loss"], {}

    if loss_fn_wrapper is not None:
        loss_fn = loss_fn_wrapper(loss_fn)

    if profiler is not None:
        from tethys_tpu.profiling import (
            intermediate_inventory, tensor_inventory_from_tree,
        )

        profiler.log_model_parameters(params)
        feat_shape = (batch_size_per_replica, config.n_mels, data_seq_len)
        lab_shape = (batch_size_per_replica, 100)
        feats = jax.ShapeDtypeStruct(feat_shape, jnp.float32)
        labs = jax.ShapeDtypeStruct(lab_shape, jnp.int32)
        input_inv = tensor_inventory_from_tree(
            {"input_features": feats, "labels": labs}, "input")
        out_shapes = jax.eval_shape(
            lambda p, f, l: model.apply({"params": p}, f, labels=l,
                                        deterministic=True),
            params, feats, labs,
        )
        output_inv = tensor_inventory_from_tree(out_shapes, "output")
        act_inv = intermediate_inventory(
            model, params, feats, labels=labs, deterministic=True)
        # Intra-op tensors (attention scores/probs/q/k/v, gelu) are not
        # module outputs — enumerated analytically (reference census,
        # whisper_dist_tensorsize.py:646-777).
        from tethys_tpu.profiling.tensorsize import whisper_intra_op_inventory

        intra_inv = whisper_intra_op_inventory(
            config, batch_size_per_replica,
            # ceil-div: the stride-2 SAME conv's frame count (matches the
            # model for odd data_seq_len too)
            enc_len=-(-data_seq_len // 2), dec_len=lab_shape[1])
        grad_inv = tensor_inventory_from_tree(params, "gradient")
        static_inventories = [
            (input_inv, "input"), (act_inv, "activation"),
            (intra_inv, "activation"),
            (output_inv, "output"), (grad_inv, "gradient"),
        ]
        step_hooks = tuple(step_hooks) + (
            _profiler_hooks(profiler, static_inventories, "whisper"),
        )

    if tensor_parallel > 1:
        step_fn = tp_lib.make_tp_train_step(loss_fn, optimizer, mesh,
                                            remat=remat,
                                            grad_accum=grad_accum)
    elif seq_parallel > 1:
        step_fn = sp_lib.make_sp_train_step(loss_fn, optimizer, mesh,
                                            remat=remat,
                                            grad_accum=grad_accum)
    elif pipeline_parallel > 1:
        # The PP step owns the model forward (the GPipe schedule replaces
        # the encoder layer loop); loss_fn/loss_fn_wrapper don't apply.
        step_fn = pp_lib.make_pp_train_step(
            model, optimizer, mesh, state,
            num_microbatches=num_microbatches, remat=remat,
            deterministic=False, grad_accum=grad_accum)
    else:
        step_fn = dp.make_train_step(loss_fn, optimizer, mesh, hardened=False,
                                     remat=remat, grad_accum=grad_accum)
    if collective_report:
        gbatch = batch_size_per_replica * dict(mesh.shape).get("data", 1)
        _emit_collective_report(
            step_fn, state,
            (_batch_aval((gbatch, config.n_mels, data_seq_len),
                         jnp.float32, mesh),
             _batch_aval((gbatch, 100), jnp.int32, mesh)),
            rng,
        )
    dataset = data_lib.create_whisper_dummy_dataset(
        data_batch, n_mels=config.n_mels, seq_len=data_seq_len
    )
    ckpt = CheckpointManager(checkpoint_dir) if checkpointing else None
    if resume and ckpt is not None:
        # Extension: the reference is write-only (SURVEY §5.4); restoring the
        # latest tag makes the jobs preemption-resumable.  Scoped to this
        # job's tag prefix so a foreign job's pytree is never restored.
        # restore_like places leaves straight into the live state's
        # shardings, so --resume works for DP, TP, and SP states alike.
        latest = ckpt.latest_tag(prefix=f"whisper_{model_type}")
        if latest:
            state = ckpt.restore_like(latest, state)
            print(f"Resumed from checkpoint {latest}")
    step_hooks, _bridge = _maybe_start_monitor_bridge(step_hooks)

    result = run_training(
        step_fn, dataset, state, rng,
        num_epochs=num_epochs, max_iterations=num_batches,
        prepare_batch=functools.partial(dp.shard_batch, mesh=mesh),
        checkpoint_manager=ckpt,
        checkpoint_tag=f"whisper_{model_type}",
        step_hooks=step_hooks,
    )
    if _bridge is not None:
        _bridge.stop()
    if pipeline_parallel > 1:
        # In-loop checkpoints stay in the packed (stage-sharded) layout so
        # --resume round-trips; the returned/final-saved params go back to
        # the canonical layers_{i} tree for interop.  gather_unpacked_params
        # all-gathers the stage shards first: on a multi-process mesh a bare
        # device_get would raise on the non-addressable stages.
        result = result._replace(state=dp.TrainState(
            pp_lib.gather_unpacked_params(result.state.params,
                                          config.encoder_layers, mesh),
            result.state.opt_state))
    return result, model, config


def train_wav2vec2(
    model_type: str = "pretraining",
    model_size: str = "small",
    batch_size_per_replica: int = 1,
    num_batches: int = 5,
    num_epochs: int = 1,
    learning_rate: float = 3e-5,
    mesh=None,
    compute_dtype: str = "float32",
    seed: int = 42,
    checkpointing: bool = True,
    checkpoint_dir: Optional[str] = None,
    audio_length: int = 32000,
    real_ctc: bool = False,
    step_hooks: tuple = (),
    loss_fn_wrapper: Optional[Callable] = None,
    config_overrides: Optional[dict] = None,
    profiler=None,
    profile_values: bool = True,
    resume: bool = False,
    collective_report: bool = False,
    tensor_parallel: int = 1,
    seq_parallel: int = 1,
    remat: bool = False,
    grad_accum: int = 1,
):
    """End-to-end Wav2Vec2 training job (reference train_wav2vec2,
    speech_jobs/wav2vec2_dist.py:1263-1376).  With `profiler` set, adds the
    tensorsize + in-graph per-value skewness instrumentation of
    wav2vec2_dist_tensorsize.py.

    `tensor_parallel > 1` trains over a 2-D (data, model) mesh (extension;
    tp.py's sharding rules cover the wav2vec2 convs, quantizer codebook,
    and trunk matmuls); `seq_parallel > 1` over a (data, seq) mesh with
    the post-conv encoder time axis sharded (same hooks as Whisper —
    pays off for long-audio configs, T≈100 at the default 2 s clips).
    Both keep the reference's hardened aggregation contract per parallel
    group (round-3 fix: NaN scrub, 1/N, per-replica clip,
    SUM-of-replica-losses logging — the scraped stdout loss line means
    the same thing with or without --tp/--sp).  `grad_accum`
    scan-accumulates N microbatches per step (see dp.make_train_step)."""
    if tensor_parallel > 1 and seq_parallel > 1:
        raise ValueError("tensor_parallel and seq_parallel are exclusive")
    if tensor_parallel > 1:
        from tethys_tpu.parallel import tp as tp_lib

        mesh = mesh or tp_lib.make_2d_mesh(model_parallel=tensor_parallel)
    elif seq_parallel > 1:
        from tethys_tpu.parallel import sp as sp_lib

        mesh = mesh or sp_lib.make_seq_mesh(seq_parallel=seq_parallel)
    else:
        mesh = mesh or mesh_lib.make_data_mesh()
    # Each process feeds its local shard; global batch = per-replica × n.
    model_par = (dict(mesh.shape).get("model", 1)
                 * dict(mesh.shape).get("seq", 1))
    data_batch = batch_size_per_replica * max(
        len(mesh.local_devices) // model_par, 1)

    model, config = wav2vec2_lib.create_full_model(
        model_type, model_size, real_ctc=real_ctc, compute_dtype=compute_dtype,
        **(config_overrides or {})
    )
    rng = jax.random.PRNGKey(seed)
    params = _init_wav2vec2(model, config, rng, model_type)
    optimizer = dp.wav2vec2_optimizer(learning_rate)
    if tensor_parallel > 1:
        state = tp_lib.init_tp_state(params, optimizer, mesh)
    elif seq_parallel > 1:
        state = sp_lib.init_sp_state(params, optimizer, mesh)
    else:
        state = dp.TrainState(params, optimizer.init(params))
        state = dp.replicate_state(state, mesh)

    def loss_fn(params, batch, step_rng):
        features, labels = batch
        rng_dropout, rng_negatives = jax.random.split(step_rng)
        if model_type == "pretraining":
            outputs = model.apply(
                {"params": params}, features, training=True,
                rngs={"dropout": rng_dropout},
            )
            loss, aux = wav2vec2_lib.pretraining_loss(
                config, outputs, rng_negatives
            )
            return loss, aux
        if model_type == "asr":
            outputs = model.apply(
                {"params": params}, features,
                labels=labels.astype(jnp.int32), training=True,
                rngs={"dropout": rng_dropout},
            )
        elif model_type == "classification":
            outputs = model.apply(
                {"params": params}, features,
                labels=labels.astype(jnp.int32), training=True,
                rngs={"dropout": rng_dropout},
            )
        else:
            raise ValueError(f"unsupported model_type {model_type}")
        return outputs["loss"], {}

    if loss_fn_wrapper is not None:
        loss_fn = loss_fn_wrapper(loss_fn)

    grad_aux_fn = None
    return_aux = False
    if profiler is not None:
        from tethys_tpu.profiling import (
            intermediate_inventory, tensor_inventory_from_tree,
        )
        from tethys_tpu.profiling.tensorsize import (
            tree_value_skewness, value_skewness,
        )

        profiler.log_model_parameters(params)
        audio_sds = jax.ShapeDtypeStruct(
            (batch_size_per_replica, audio_length), jnp.float32)
        input_inv = tensor_inventory_from_tree(
            {"input_values": audio_sds}, "input")
        # Shapes of the *training* forward (includes the quantizer branch).
        out_shapes = jax.eval_shape(
            lambda p, a: model.apply({"params": p}, a, training=True,
                                     rngs={"dropout": rng}),
            params, audio_sds,
        )
        output_inv = tensor_inventory_from_tree(out_shapes, "output")
        act_inv = intermediate_inventory(
            model, params, audio_sds, training=True, rngs={"dropout": rng})
        from tethys_tpu.profiling.tensorsize import (
            conv_output_length, wav2vec2_intra_op_inventory,
        )

        intra_inv = wav2vec2_intra_op_inventory(
            config, batch_size_per_replica,
            frames=conv_output_length(audio_length, config.conv_stride))
        grad_inv = tensor_inventory_from_tree(params, "gradient")
        static_inventories = [
            (input_inv, "input"), (act_inv, "activation"),
            (intra_inv, "activation"),
            (output_inv, "output"), (grad_inv, "gradient"),
        ]
        step_hooks = tuple(step_hooks) + (
            _profiler_hooks(profiler, static_inventories, "wav2vec2"),
        )
        return_aux = True

        if profile_values:
            base_loss_fn = loss_fn

            def loss_fn(params, batch, step_rng):  # noqa: F811
                loss, aux = base_loss_fn(params, batch, step_rng)
                features = batch[0]
                skews = {"input/input_values": value_skewness(features)}
                for key, val in (aux or {}).items():
                    if hasattr(val, "size") and val.size > 1:
                        skews[f"output/{key}"] = value_skewness(val)
                return loss, {"value_skews": skews}

            grad_aux_fn = lambda grads: tree_value_skewness(  # noqa: E731
                grads, "gradient")

    if tensor_parallel > 1:
        step_fn = tp_lib.make_tp_train_step(
            loss_fn, optimizer, mesh, remat=remat, hardened=True,
            return_aux=return_aux, grad_aux_fn=grad_aux_fn,
            grad_accum=grad_accum,
        )
    elif seq_parallel > 1:
        step_fn = sp_lib.make_sp_train_step(
            loss_fn, optimizer, mesh, remat=remat, hardened=True,
            return_aux=return_aux, grad_aux_fn=grad_aux_fn,
            grad_accum=grad_accum,
        )
    else:
        step_fn = dp.make_train_step(
            loss_fn, optimizer, mesh, hardened=True,
            return_aux=return_aux, grad_aux_fn=grad_aux_fn,
            grad_accum=grad_accum,
        )
    if collective_report:
        gbatch = batch_size_per_replica * mesh_lib.num_replicas(mesh)
        _emit_collective_report(
            step_fn, state,
            (_batch_aval((gbatch, audio_length), jnp.float32, mesh),
             _batch_aval((gbatch,), jnp.float32, mesh)),
            rng,
        )
    dataset = data_lib.create_wav2vec2_dummy_dataset(
        data_batch, audio_length=audio_length
    )
    ckpt = CheckpointManager(checkpoint_dir) if checkpointing else None
    if resume and ckpt is not None:
        # Extension: the reference is write-only (SURVEY §5.4); restoring the
        # latest tag makes the jobs preemption-resumable.
        latest = ckpt.latest_tag(prefix="model")
        if latest:
            state = ckpt.restore_like(latest, state)
            print(f"Resumed from checkpoint {latest}")
    step_hooks, _bridge = _maybe_start_monitor_bridge(step_hooks)

    result = run_training(
        step_fn, dataset, state, rng,
        num_epochs=num_epochs, max_iterations=num_batches,
        prepare_batch=functools.partial(dp.shard_batch, mesh=mesh),
        checkpoint_manager=ckpt,
        checkpoint_every_steps=50 if checkpointing else None,
        checkpoint_tag="model",
        resilient=True,
        step_hooks=step_hooks,
    )
    if _bridge is not None:
        _bridge.stop()
    return result, model, config


def finalize_job(result: TrainLoopResult, name: str, jct_seconds: float,
                 single: bool = False) -> None:
    """Common epilogue: JCT print + file + final weights save
    (reference speech_jobs/whisper_dist.py:1001-1026)."""
    from tethys_tpu.parallel.mesh import job_identity
    from tethys_tpu.utils.artifacts import write_jct

    print("Training completed.")
    print("jct:", jct_seconds)
    task_type, task_index = job_identity()
    write_jct(jct_seconds, task_type, task_index, single=single)
    try:
        save_final_weights(result.state.params, name)
    except Exception as e:  # noqa: BLE001 — missing volume must not kill job
        print(f"final weight save failed: {e}")
