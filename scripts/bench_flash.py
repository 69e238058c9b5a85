"""Kernel-level timing harness for the flash attention kernels.

Times the REAL `_flash_fwd` / `_flash_bwd` at whisper-encoder shapes by
chaining N invocations inside one jit (a scalar data dependency forces
sequential execution; the final scalar fetch forces completion — plain
block_until_ready can return early on tunneled TPU runtimes).

Usage: python scripts/bench_flash.py [--bh 128] [--t 1536] [--kv_len 1500]
       [--rate 0.1] [--iters 50] [--tq TQ]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bh", type=int, default=128)      # B*H (whisper-base: 16*8)
    p.add_argument("--t", type=int, default=1536)      # padded KV length
    p.add_argument("--tq", type=int, default=None)     # query length (default t)
    p.add_argument("--kv_len", type=int, default=1500)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    tq = args.tq or args.t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tethys_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from tethys_tpu.ops import pallas_attention as pa

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    shape_q = (args.bh, tq, 64)
    shape_kv = (args.bh, args.t, 64)
    q = jnp.asarray(rng.standard_normal(shape_q), dtype=dtype) * 0.3
    k = jnp.asarray(rng.standard_normal(shape_kv), dtype=dtype) * 0.3
    v = jnp.asarray(rng.standard_normal(shape_kv), dtype=dtype)
    do = jnp.asarray(rng.standard_normal(shape_q), dtype=dtype)
    seed = jnp.asarray([7], dtype=jnp.int32)

    def chain(body, n):
        def f(*arrays):
            def step(_, carry):
                out = body(*arrays, carry)
                return jnp.sum(out[0, 0]).astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))
        return jax.jit(f)

    def fwd_body(q, k, v, carry):
        o, _ = pa._flash_fwd(q * (1 + carry), k, v, seed, args.rate,
                             args.kv_len)
        return o

    o0, lse0 = pa._flash_fwd(q, k, v, seed, args.rate, args.kv_len)

    def bwd_body(q, k, v, do, o, lse, carry):
        dq, dk, dv = pa._flash_bwd(q * (1 + carry), k, v, o, lse, do,
                                   seed, args.rate, args.kv_len)
        return dq

    def run(name, fn, arrays, iters):
        r = fn(*arrays)
        float(r)  # force (includes compile)
        t0 = time.perf_counter()
        r = fn(*arrays)
        float(r)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:8.3f} ms/call   "
              f"(bh={args.bh} tq={tq} t={args.t} rate={args.rate} "
              f"base2={getattr(pa, '_BASE2', None)})")
        return dt

    fwd = chain(fwd_body, args.iters)
    bwd = chain(bwd_body, args.iters)
    run("flash_fwd", fwd, (q, k, v), args.iters)
    run("flash_bwd", bwd, (q, k, v, do, o0, lse0), args.iters)


if __name__ == "__main__":
    main()
