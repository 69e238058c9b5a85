"""Headline benchmark: Whisper-base training throughput on one chip.

Prints ONE JSON line:
  {"metric": "whisper_base_audio_sec_per_sec_per_chip", "value": N,
   "unit": "audio-sec/sec/chip", "vs_baseline": N, ...}

audio-sec/sec/chip = (batch * 30 s of audio) / steady-state step time of the
full jitted train step (fwd + bwd + Adam), per chip.  `vs_baseline` compares
against `bench_baseline.json` at the repo root (the recorded reference-class
number); 1.0 when no baseline is recorded yet.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--model", type=str, default="base")
    args = parser.parse_args()

    from tethys_tpu.utils.device import enable_host_cpu, host_cpu_context

    enable_host_cpu()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: TPU compiles of whisper-base are minutes-slow
    # and highly variable; cache them across bench invocations.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

    from tethys_tpu.models.whisper import create_whisper_model
    from tethys_tpu.parallel import dp
    from tethys_tpu.parallel.mesh import make_data_mesh

    mesh = make_data_mesh(1)
    model, config = create_whisper_model(args.model, compute_dtype=args.dtype)
    rng = jax.random.PRNGKey(0)

    np_rng = np.random.default_rng(0)
    features = jnp.asarray(
        np_rng.standard_normal((args.batch_size, config.n_mels, 3000),
                               dtype=np.float32)
    )
    labels = jnp.asarray(
        np_rng.integers(3, 100, size=(args.batch_size, 100)), dtype=jnp.int32
    )

    with host_cpu_context():  # init is one-shot; skip the slow TPU round-trip
        params = model.init(
            {"params": rng, "dropout": rng},
            features[:1, :, :64], labels=labels[:1], deterministic=True,
        )["params"]
    optimizer = dp.whisper_optimizer(1e-4)
    state = dp.replicate_state(
        dp.TrainState(params, optimizer.init(params)), mesh
    )

    def loss_fn(p, batch, step_rng):
        f, l = batch
        out = model.apply(
            {"params": p}, f, labels=l,
            deterministic=False, rngs={"dropout": step_rng},
        )
        return out["loss"], {}

    step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=False)
    batch = dp.shard_batch((features, labels), mesh)

    def force(state, loss):
        # On tunneled TPU runtimes block_until_ready can return before the
        # device finishes; a host fetch of values that depend on the whole
        # fwd+bwd+update chain (earliest conv kernel + loss) cannot.
        kernel = state.params["model"]["encoder"]["conv1"]["kernel"]
        return float(kernel[0, 0, 0]) + float(loss)

    for i in range(args.warmup):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
    force(state, loss)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = step(state, batch, jax.random.fold_in(rng, 100 + i))
    force(state, loss)
    step_time = (time.perf_counter() - t0) / args.steps
    audio_sec_per_sec = args.batch_size * 30.0 / step_time

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("whisper_base_audio_sec_per_sec_per_chip")
        if ref:
            vs_baseline = audio_sec_per_sec / float(ref)

    print(json.dumps({
        "metric": "whisper_base_audio_sec_per_sec_per_chip",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "step_time_s": round(step_time, 4),
        "batch_size": args.batch_size,
        "dtype": args.dtype,
        "loss": round(float(jax.device_get(loss)), 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
