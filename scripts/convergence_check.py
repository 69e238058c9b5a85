"""Convergence check: f32 vs bf16 master params (+bf16 Adam moments).

VERDICT r3 item 8 — the single-chip capacity mode (--master_dtype bfloat16,
used for the medium/large HBM fits) quarters optimizer memory by keeping
master params and Adam mu/nu in bf16; Adam moment quantization is a classic
silent-quality trap, so this runs N steps of whisper-base under BOTH master
dtypes on identical data/rng and prints the loss curves + a verdict.

Usage: python scripts/convergence_check.py [--steps 100 --family whisper]
Writes the JSON record to stdout; paste the summary into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_curve(master_dtype: str, family: str, steps: int, model: str):
    import argparse as ap

    import jax

    import bench

    ns = ap.Namespace(batch_size=None, steps=steps, warmup=0,
                      dtype="bfloat16", model=model, family=family,
                      scan_layers=False, master_dtype=master_dtype,
                      remat=False, remat_layers=False,
                      remat_policy="save_flash", flat_opt=False)
    state, step, batch, probe, _, _, ns = bench.build_family_step(ns, family)
    rng = jax.random.PRNGKey(0)
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(loss)
    vals = [float(v) for v in jax.device_get(losses)]
    probe(state)
    print(f"{master_dtype}: {steps} steps in "
          f"{time.perf_counter() - t0:.0f}s, loss {vals[0]:.4f} -> "
          f"{vals[-1]:.4f}", file=sys.stderr, flush=True)
    return vals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--family", default="whisper")
    p.add_argument("--model", default="base")
    args = p.parse_args()

    import jax

    from tethys_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    f32 = run_curve("float32", args.family, args.steps, args.model)
    bf16 = run_curve("bfloat16", args.family, args.steps, args.model)

    # Relative loss gap over the back half of the run (post-warmup).
    half = args.steps // 2
    gaps = [abs(a - b) / max(abs(a), 1e-9)
            for a, b in zip(f32[half:], bf16[half:])]
    max_gap = max(gaps)
    both_decreasing = f32[-1] < f32[0] and bf16[-1] < bf16[0]
    verdict = ("match" if max_gap < 0.02 and both_decreasing
               else "diverged" if not both_decreasing else "gap")
    print(json.dumps({
        "metric": f"{args.family}_{args.model}_bf16_master_convergence",
        "steps": args.steps,
        "f32_first_last": [round(f32[0], 4), round(f32[-1], 4)],
        "bf16_first_last": [round(bf16[0], 4), round(bf16[-1], 4)],
        "max_rel_gap_back_half": round(max_gap, 4),
        "verdict": verdict,
        "f32_curve_every5": [round(v, 4) for v in f32[::5]],
        "bf16_curve_every5": [round(v, 4) for v in bf16[::5]],
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
