"""Audio frontend benchmark: fused pallas log-mel vs the XLA STFT path.

One JSON line: ms per 16x30 s batch for each implementation on the current
backend (VERDICT r3 item 5 / BASELINE.json stretch config "streaming fused
log-mel").  Usage: python scripts/bench_frontend.py [--batch 16 --seconds 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=int, default=30)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tethys_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from tethys_tpu.audio.frontend import extract_fbank_features
    from tethys_tpu.audio.pallas_logmel import fused_log_mel

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal(
        (args.batch, args.seconds * 16000)).astype(np.float32))
    wave = jax.device_put(wave)

    def timed(fn):
        jitted = jax.jit(fn)
        out = jitted(wave)
        float(out[0, 0, 0])  # force (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jitted(wave)
        float(out[0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    xla_ms = timed(extract_fbank_features)
    fused_ms = timed(fused_log_mel)
    print(json.dumps({
        "metric": "frontend_logmel_ms_per_batch",
        "batch": args.batch, "seconds": args.seconds,
        "xla_ms": round(xla_ms, 3), "fused_ms": round(fused_ms, 3),
        "speedup": round(xla_ms / fused_ms, 3),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
