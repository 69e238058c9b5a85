"""Serving-path benchmark: batched greedy decoding with the KV cache.

Measures whisper-base autoregressive generation on one chip — encode a
batch of 30 s log-mel inputs, then greedy-decode `--length` tokens through
`models.whisper.greedy_generate` (jit'd whole: encoder + a fixed-length
lax.scan over cached single-token decode steps with a done-mask — every run
executes exactly `--length` steps regardless of EOS; the while_loop form
never survived the remote compiler).  Prints one JSON line:

    {"metric": "whisper_base_decode_tokens_per_sec_per_chip", ...}

with decode tokens/s, per-token latency, and the end-to-end real-time
factor (audio seconds transcribed per wall second, encode included).

Random weights never emit EOS at step 1, so the loop runs the full
`--length` — the measurement is shape-accurate for real serving.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--model", default="base")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--early_stop_chunk", type=int, default=None,
                   help="decode in C-step chunks inside a lax.while_loop "
                        "(stops within C-1 steps of a global EOS); must "
                        "divide --length")
    p.add_argument("--host_chunk", type=int, default=None,
                   help="host-loop early stop: one jitted C-step chunk "
                        "dispatched repeatedly, done-flag checked between "
                        "chunks (models.whisper.make_chunked_greedy); "
                        "compiles where the while-of-scans form does not")
    p.add_argument("--force_eos", action="store_true",
                   help="bias the lm_head so EOS always wins (global EOS "
                        "at decode step 1) — demonstrates early-stop "
                        "savings on random weights")
    p.add_argument("--kv_quant", default="int8", choices=["none", "int8"],
                   help="quantize the per-generate cross-KV caches (int8 + "
                        "per-column f32 scales) — halves the dominant decode "
                        "HBM stream.  DEFAULT since the round-5 ladder A/B "
                        "(+25%%/+28%% tokens/s at medium/large, wash at "
                        "base); tokens may differ from the bf16 cache in "
                        "near-tie argmax steps (logit error ~4e-4 rel, "
                        "test-pinned).  --kv_quant none is the bf16 kill "
                        "switch (ops/pallas_decode.py)")
    p.add_argument("--no_fused_decode", action="store_true",
                   help="A/B switch: disable the fused self-attention + "
                        "cache-append pallas kernel (ops/pallas_decode.py) "
                        "and run the unfused DUS + decode_attention path")
    args = p.parse_args()
    if args.no_fused_decode:
        os.environ["TETHYS_FUSED_DECODE"] = "0"

    from tethys_tpu.utils.device import enable_host_cpu, host_cpu_context

    enable_host_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tethys_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from tethys_tpu.models.whisper import create_whisper_model, greedy_generate

    model, config = create_whisper_model(args.model, compute_dtype=args.dtype,
                                         kv_quant=args.kv_quant)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    features = jnp.asarray(np_rng.standard_normal(
        (args.batch_size, config.n_mels, 3000), dtype=np.float32))
    labels = jnp.asarray(
        np_rng.integers(3, 100, size=(args.batch_size, 8)), dtype=jnp.int32)

    with host_cpu_context():
        variables = {"params": model.init(
            {"params": rng, "dropout": rng},
            features[:1, :, :64], labels=labels[:1], deterministic=True,
        )["params"]}
    # Init ran on host CPU; move the weights onto the chip once so the
    # timed calls don't re-transfer ~300 MB per invocation.
    print("uploading weights to device...", file=sys.stderr, flush=True)
    t_u = time.perf_counter()
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    print(f"uploaded in {time.perf_counter() - t_u:.0f}s",
          file=sys.stderr, flush=True)

    if args.force_eos:
        # Global EOS at decode step 1 on random weights: make every batch
        # row identical, probe which token the model actually emits first,
        # and declare THAT token the EOS id (lm_head has no bias to
        # surgically inflate — reference parity).
        import dataclasses

        from tethys_tpu.models.whisper import WhisperForConditionalGeneration

        features = jnp.broadcast_to(features[:1], features.shape)
        probe = jax.jit(lambda v, f: greedy_generate(
            model, v, f, max_length=2))
        toks, _ = probe(variables, features[:1])
        first = int(jax.device_get(toks[0, 1]))
        config = dataclasses.replace(config, eos_token_id=first)
        model = WhisperForConditionalGeneration(config)

    # Params MUST be jit arguments, not closure captures: captured arrays
    # are baked into the program as literals, and on remote-compile runtimes
    # the ~300 MB upload is rejected (HTTP 413) or crawls for tens of
    # minutes.
    if args.host_chunk is not None:
        from tethys_tpu.models.whisper import make_chunked_greedy

        gen = make_chunked_greedy(model, max_length=args.length,
                                  chunk=args.host_chunk)
    else:
        gen = jax.jit(
            lambda v, feats: greedy_generate(
                model, v, feats, max_length=args.length,
                early_stop_chunk=args.early_stop_chunk))
    encode = jax.jit(
        lambda v, feats: model.apply(v, feats, method=model.encode))

    print(f"compiling generate (batch={args.batch_size} "
          f"len={args.length})...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    if args.host_chunk is None:
        gen = gen.lower(variables, features).compile()
    print(f"compiled in {time.perf_counter() - t_c:.0f}s",
          file=sys.stderr, flush=True)
    tokens, length = gen(variables, features)
    n_decoded = int(jax.device_get(length)) - 1
    int(jax.device_get(tokens[0, 1]))  # force
    float(jax.device_get(encode(variables, features)[0, 0, 0]))  # warm

    def timed(fn, forcer):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, features)
        forcer(out)
        return (time.perf_counter() - t0) / args.iters

    dt_total = timed(gen, lambda o: (int(jax.device_get(o[0][0, -1])),
                                     int(jax.device_get(o[1]))))
    dt_encode = timed(encode,
                      lambda o: float(jax.device_get(o[0, -1, 0])))
    dt_decode = max(dt_total - dt_encode, 1e-9)
    # The encode-subtraction protocol fails when per-call wall overhead
    # (tunnel dispatch) dominates both measurements — dt_total then lands
    # at/below dt_encode and the decode rate explodes.  Fall back to the
    # whole-generate time (a LOWER bound on decode tokens/s) and flag it.
    subtraction_failed = dt_decode < 0.05 * dt_total
    if subtraction_failed:
        dt_decode = dt_total

    total_tokens = n_decoded * args.batch_size
    audio_seconds = 30.0 * args.batch_size
    print(json.dumps({
        "metric": f"whisper_{args.model}_decode_tokens_per_sec_per_chip",
        "value": round(total_tokens / dt_decode, 1),
        "unit": "tokens/sec/chip",
        "per_token_latency_ms": round(dt_decode / n_decoded * 1e3, 3),
        "encode_ms": round(dt_encode * 1e3, 2),
        "rtf_e2e": round(audio_seconds / dt_total, 1),
        **({"decode_is_whole_generate_lower_bound": True}
           if subtraction_failed else {}),
        "batch_size": args.batch_size,
        "decode_len": n_decoded,
        "dtype": args.dtype,
        **({"kv_quant": args.kv_quant} if args.kv_quant != "none" else {}),
        "backend": jax.default_backend(),
        **({"host_chunk": args.host_chunk,
            "chunks_run": getattr(gen, "chunks_run", None)}
           if args.host_chunk is not None else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
