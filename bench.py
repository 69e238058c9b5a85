"""Headline benchmark: training throughput on one chip, both model families.

With no arguments, prints one JSON line per family — Wav2Vec2-base
contrastive pretraining (2 s clips, batch 32) first, then the headline
Whisper-base line LAST (the driver parses the tail):
  {"metric": "whisper_base_audio_sec_per_sec_per_chip", "value": N,
   "unit": "audio-sec/sec/chip", "vs_baseline": N, ...}

audio-sec/sec/chip = (batch * seconds of audio per sample) / steady-state
step time of the full jitted train step (fwd + bwd + Adam), per chip.
`vs_baseline` compares against `bench_baseline.json` at the repo root (the
recorded reference-class number); 1.0 when no baseline is recorded yet.

`--family whisper|wav2vec2` benches a single family.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _build_whisper(args, jax, jnp, dp, host_cpu_context):
    from tethys_tpu.models.whisper import create_whisper_model

    model, config = create_whisper_model(
        args.model, compute_dtype=args.dtype,
        remat_layers=getattr(args, "remat_layers", False),
        remat_policy=getattr(args, "remat_policy", "save_flash"))
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    features = jnp.asarray(
        np_rng.standard_normal((args.batch_size, config.n_mels, 3000),
                               dtype=np.float32))
    labels = jnp.asarray(
        np_rng.integers(3, 100, size=(args.batch_size, _WHISPER_LABEL_LEN)),
        dtype=jnp.int32)

    with host_cpu_context():  # init is one-shot; skip the slow TPU round-trip
        params = model.init(
            {"params": rng, "dropout": rng},
            features[:1, :, :64], labels=labels[:1], deterministic=True,
        )["params"]
    optimizer = dp.whisper_optimizer(1e-4)

    def loss_fn(p, batch, step_rng):
        f, l = batch
        out = model.apply(
            {"params": p}, f, labels=l,
            deterministic=False, rngs={"dropout": step_rng},
        )
        return out["loss"], {}

    def probe(state):
        return float(state.params["model"]["encoder"]["conv1"]["kernel"][0, 0, 0])

    audio_seconds = 30.0
    return (params, optimizer, loss_fn, (features, labels), probe,
            audio_seconds, False, f"whisper_{args.model}")


def _build_wav2vec2(args, jax, jnp, dp, host_cpu_context):
    from tethys_tpu.models.wav2vec2 import create_full_model, pretraining_loss

    model, config = create_full_model(
        "pretraining", args.model, compute_dtype=args.dtype,
        scan_layers=getattr(args, "scan_layers", False))
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    audio = jnp.asarray(
        np_rng.standard_normal((args.batch_size, 32000), dtype=np.float32))
    labels = jnp.zeros((args.batch_size,), dtype=jnp.float32)

    with host_cpu_context():
        params = model.init(
            {"params": rng, "dropout": rng}, audio[:1, :2000], training=True,
            deterministic=True,  # init may run on CPU; fused dropout is TPU-only
        )["params"]
    optimizer = dp.wav2vec2_optimizer(3e-5)

    def loss_fn(p, batch, step_rng):
        features, _ = batch
        rng_d, rng_n = jax.random.split(step_rng)
        outputs = model.apply(
            {"params": p}, features, training=True, rngs={"dropout": rng_d},
        )
        loss, _aux = pretraining_loss(config, outputs, rng_n)
        return loss, {}

    def probe(state):
        kern = state.params["wav2vec2"]["feature_extractor"]["conv_0"]["kernel"]
        return float(kern[0, 0, 0])

    audio_seconds = 2.0
    return (params, optimizer, loss_fn, (audio, labels), probe,
            audio_seconds, True, f"wav2vec2_{args.model}")


_FAMILY_DEFAULT_BATCH = {"whisper": 16, "wav2vec2": 32}
# Learning rates the builders bake into their optimizers; the flat path
# rebuilds the optimizer from these (single source for scripts/profile_step).
_FAMILY_LR = {"whisper": 1e-4, "wav2vec2": 3e-5}


def build_family_step(args, family: str):
    """Construct (state, step, batch, probe, audio_seconds, model_tag) for
    one family — the exact configuration bench.py measures.  Shared with
    scripts/profile_step.py so profiles always describe the benchmarked
    setup."""
    import jax
    import jax.numpy as jnp

    from tethys_tpu.parallel import dp
    from tethys_tpu.parallel.mesh import make_data_mesh
    from tethys_tpu.utils.device import host_cpu_context

    if args.batch_size is None:
        args = argparse.Namespace(**vars(args))
        args.batch_size = _FAMILY_DEFAULT_BATCH[family]

    mesh = make_data_mesh(1)
    builder = _build_whisper if family == "whisper" else _build_wav2vec2
    (params, optimizer, loss_fn, host_batch, probe, audio_seconds, hardened,
     model_tag) = builder(args, jax, jnp, dp, host_cpu_context)

    if getattr(args, "master_dtype", "float32") == "bfloat16":
        # Capacity mode for medium/large single-chip fits: bf16 master params
        # => optax Adam keeps mu/nu in the param dtype, quartering optimizer
        # HBM (12.4 GB -> 4.6 GB at whisper-medium's 769 M params).  Same
        # trade the TP path offers via tp.replicate_state(param_dtype=...).
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)

    if getattr(args, "flat_opt", False):
        # Flat-buffer master params (parallel/flat.py).  SLOWER single-chip
        # (see BASELINE.md negative results: flat<->pytree boundary relayout
        # costs ~7 ms/step at these param counts); kept for A/B and for
        # multi-host meshes where 1 collective vs ~230 may win.
        from tethys_tpu.parallel import flat as flat_lib

        spec = flat_lib.FlatSpec(params)
        optimizer = flat_lib.flat_optimizer(spec, family, _FAMILY_LR[family])
        vec = spec.flatten(params)
        state = dp.replicate_state(
            dp.TrainState(vec, optimizer.init(vec)), mesh)
        step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=hardened,
                                  flat_spec=spec)
        # The flat path builds its step without remat; clear the flag so
        # the analytic custom-call FLOPs don't bill a forward replay that
        # never runs (it would inflate MFU by the whole-loss-remat factor).
        if getattr(args, "remat", False):
            import sys
            print("bench: --flat_opt ignores --remat (flat step has no "
                  "remat path); FLOPs/MFU accounted without remat",
                  file=sys.stderr)
            args.remat = False
        probe = lambda s: float(s.params[0])  # noqa: E731
    else:
        state = dp.replicate_state(
            dp.TrainState(params, optimizer.init(params)), mesh)
        step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=hardened,
                                  remat=getattr(args, "remat", False))
    batch = dp.shard_batch(host_batch, mesh)
    return state, step, batch, probe, audio_seconds, model_tag, args


def _step_flops(step, state, batch, rng):
    """FLOPs of one compiled train step from XLA's own cost model.

    Shares the persistent compile cache with the measured steps, so the
    lower().compile() here is a cache hit.  Returns None when the runtime's
    cost analysis is unavailable (observability must not fail the bench).

    NOTE: this enumerates HLO ops only — the flash-attention custom calls
    are invisible to it.  Callers must add `_custom_call_flops` for an
    exact figure (profiling/flops.py)."""
    try:
        analysis = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:  # noqa: BLE001
        return None


# Label length the whisper bench feeds (see _build_whisper) — the decoder
# cross-attention FLOPs scale with it.
_WHISPER_LABEL_LEN = 100


def _custom_call_flops(args, family: str) -> float:
    """Analytic FLOPs of the Pallas custom calls in one train step at this
    bench's exact shapes — the part cost_analysis() misses."""
    from tethys_tpu.profiling import flops as flops_lib

    if family == "whisper":
        from tethys_tpu.configs import WhisperConfig

        cfg = WhisperConfig.from_size(args.model)
        return flops_lib.whisper_custom_call_flops(
            cfg, args.batch_size, label_len=_WHISPER_LABEL_LEN,
            whole_loss_remat=getattr(args, "remat", False))
    from tethys_tpu.configs import Wav2Vec2Config

    cfg = Wav2Vec2Config.from_size(args.model)
    return flops_lib.wav2vec2_custom_call_flops(
        cfg, args.batch_size, cfg.downsampled_length(32000))


def _run_family(args, family: str, tag_suffix: str = "") -> None:
    import jax

    (state, step, batch, probe, audio_seconds, model_tag,
     args) = build_family_step(args, family)
    rng = jax.random.PRNGKey(0)

    def force(state, loss):
        # On tunneled TPU runtimes block_until_ready can return before the
        # device finishes; a host fetch of values that depend on the whole
        # fwd+bwd+update chain (earliest conv kernel + loss) cannot.
        return probe(state) + float(loss)

    for i in range(args.warmup):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
    force(state, loss)
    flops_hlo = _step_flops(step, state, batch, rng)
    flops_custom = _custom_call_flops(args, family)
    # Exact per-step FLOPs = HLO cost model + the flash custom calls it
    # can't see (whisper-base: attention is ~7% of step FLOPs; grows with
    # model size).  flops_hlo stays in the JSON for cross-round continuity.
    flops_per_step = (flops_hlo + flops_custom) if flops_hlo else None

    # Fold the per-step rng streams OUTSIDE the timed loop: an eager fold_in
    # is a separate tiny dispatch (~0.5 ms through a tunneled runtime) that
    # a real input pipeline would overlap.  No per-step host sync inside the
    # loop — the device pipelines all steps; force() blocks once at the end.
    rngs = [jax.random.fold_in(rng, 100 + i) for i in range(args.steps)]
    jax.block_until_ready(rngs)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = step(state, batch, rngs[i])
    force(state, loss)
    step_time = (time.perf_counter() - t0) / args.steps
    audio_sec_per_sec = args.batch_size * audio_seconds / step_time

    # MFU against the chip's declared bf16 peak (v5e default 197 TFLOP/s;
    # override with TETHYS_PEAK_TFLOPS for other chips).  Uses the measured
    # wall step time (conservative: includes any dispatch gap).
    peak_tflops = float(os.environ.get("TETHYS_PEAK_TFLOPS", "197"))
    mfu = (round(flops_per_step / step_time / (peak_tflops * 1e12), 4)
           if flops_per_step else None)
    mfu_hlo_only = (round(flops_hlo / step_time / (peak_tflops * 1e12), 4)
                    if flops_hlo else None)

    metric = f"{model_tag}_audio_sec_per_sec_per_chip"
    baseline_key = metric
    metric += tag_suffix
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get(baseline_key)
        if ref:
            vs_baseline = audio_sec_per_sec / float(ref)

    print(json.dumps({
        "metric": metric,
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "step_time_s": round(step_time, 4),
        "batch_size": args.batch_size,
        "dtype": args.dtype,
        "loss": round(float(jax.device_get(loss)), 4),
        "backend": jax.default_backend(),
        "flops_per_step": flops_per_step,
        "flops_hlo": flops_hlo,
        "flops_custom_calls": flops_custom,
        "mfu": mfu,
        "mfu_hlo_only": mfu_hlo_only,
        "peak_tflops": peak_tflops,
    }), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=None,
                        help="default: 16 (whisper) / 32 (wav2vec2)")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--model", type=str, default="base")
    parser.add_argument("--family", type=str, default="both",
                        choices=["both", "whisper", "wav2vec2"])
    parser.add_argument("--scan_layers", action="store_true",
                        help="wav2vec2: run the encoder as nn.scan over "
                             "[L, ...]-stacked params (A/B vs unrolled)")
    parser.add_argument("--master_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="master param/Adam-state dtype; bfloat16 is the "
                             "single-chip capacity mode for medium/large")
    parser.add_argument("--remat", action="store_true",
                        help="wrap the loss in jax.checkpoint (needed to fit "
                             "whisper-medium/large activations on one chip)")
    parser.add_argument("--remat_layers", action="store_true",
                        help="whisper: per-layer nn.remat instead of the "
                             "whole-loss checkpoint (holds only layer-"
                             "boundary activations; the real capacity mode "
                             "for medium/large)")
    parser.add_argument("--remat_policy", type=str, default="save_flash",
                        choices=["save_flash", "none"],
                        help="remat_layers policy: save_flash keeps the "
                             "flash kernel outputs so the backward skips "
                             "the forward-kernel recompute")
    parser.add_argument("--flat_opt", action="store_true",
                        help="use the flat-buffer optimizer path "
                             "(parallel/flat.py) instead of the per-tensor "
                             "pytree default (for A/B; slower single-chip)")
    args = parser.parse_args()

    from tethys_tpu.utils.device import enable_host_cpu

    enable_host_cpu()

    import jax

    # Persistent compile cache: TPU compiles of whisper-base are minutes-slow
    # and highly variable; cache them across bench invocations.  The dir is
    # keyed by a host CPU fingerprint so a foreign host's AOT artifacts
    # (machine-feature mismatch -> SIGILL warnings + ~500 s stalls) can never
    # be loaded (utils/cache.py).
    from tethys_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    # Relay watchdog: the tunneled TPU's DATA path can die while device
    # enumeration still works (observed rounds 3 and 5) — any transfer then
    # hangs forever and the whole bench blocks silently.  Probe a tiny
    # on-chip matmul in a subprocess with a hard timeout and emit a
    # parseable failure line instead of hanging.
    #
    # The probe MUST run before this process initializes its own backend:
    # the relay serializes clients, and a probe child started while the
    # parent already holds the device takes ~170 s even on a HEALTHY relay
    # (measured round 5) — three false bench_error exits came from exactly
    # that before the probe was hoisted here.  Gating on the env var (not
    # jax.default_backend(), which would initialize the backend) keeps the
    # parent uninitialized until the probe verdict is in; pinning the
    # child's JAX_PLATFORMS + asserting non-cpu prevents a vacuous pass on
    # the CPU fallback when TPU init fails.
    env_platforms = (os.environ.get("JAX_PLATFORMS") or "").split(",")[0]
    if env_platforms and env_platforms != "cpu":
        import subprocess
        import sys as _sys

        try:
            probe = subprocess.run(
                [_sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "assert jax.default_backend() != 'cpu';"
                 "x = jnp.ones((128, 128));"
                 "print(float(jax.jit(lambda a: (a @ a).sum())(x)))"],
                capture_output=True, timeout=180, env=dict(os.environ))
            probe_failed = probe.returncode != 0
        except subprocess.TimeoutExpired:
            probe_failed = True
        if probe_failed:
            print(json.dumps({
                "metric": "bench_error", "value": 0, "unit": "none",
                "vs_baseline": 0,
                "error": "TPU relay data path unresponsive (probe matmul "
                         "failed/hung); see BASELINE.md round-5 env notes",
            }), flush=True)
            return

    # Whisper LAST: it is the headline metric and the driver parses the tail.
    families = (["wav2vec2", "whisper"] if args.family == "both"
                else [args.family])
    for family in families:
        _run_family(args, family)
        if (family == "wav2vec2" and args.family == "both"
                and args.batch_size is None and args.model == "base"):
            # Supplementary throughput row at the measured single-chip
            # sweet spot (BASELINE.md round-4 batch ladder: 64 amortizes
            # the fixed dispatch cost and lifts MXU utilization to ~41%
            # MFU / 2.08x).  The batch-32 row above stays the primary so
            # vs_baseline remains apples-to-apples with the recorded
            # batch-32 denominator; this row's vs_baseline shares that
            # denominator and says so in the metric name.
            args64 = argparse.Namespace(**vars(args))
            args64.batch_size = 64
            _run_family(args64, family, tag_suffix="_b64_sweet_spot")


if __name__ == "__main__":
    main()
