"""XLA compiler-flag sweep over the headline bench (exploratory perf tool).

Runs `bench.py` in a fresh subprocess per flag configuration (XLA_FLAGS is
read once at backend init, so in-process sweeping is impossible) and prints
a ranked table of steady-state step times.  Each configuration gets its own
compile-cache directory — flag sets key different executables, and sharing
/tmp/jax_cache across them risks confusing staleness for signal.

Usage (real TPU):
    python scripts/sweep_xla_flags.py --family wav2vec2 --steps 10
    python scripts/sweep_xla_flags.py --family whisper --flags baseline,vmem64

The flag menu below is deliberately small: single-chip, bandwidth-bound
training steps — scheduler and vmem-budget knobs are the only levers with a
plausible mechanism (bigger fusion windows, different overlap decisions).
Collective/async flags are multi-chip-only and excluded.  Results land in
BASELINE.md by hand, wins or negatives alike.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> XLA_FLAGS string ("" = compiler defaults, the recorded baseline).
FLAG_MENU = {
    "baseline": "",
    # Raise the per-fusion scoped-VMEM budget (default ~16 MiB region use);
    # larger windows can admit fusions the default rejects.
    "vmem64": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32": "--xla_tpu_scoped_vmem_limit_kib=32768",
    # Disable the latency-hiding scheduler: single-chip there are no
    # collectives to hide, and its regrouping can pessimize fusion order.
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
    # All-or-nothing loop invariant code motion sizing.
    "licm2x": "--xla_tpu_licm_size_inflation_ratio=2.0",
}


def run_one(name: str, flags: str, args) -> dict | None:
    env = dict(os.environ)
    env["XLA_FLAGS"] = flags
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cache_sweep_{name}"
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--family", args.family, "--steps", str(args.steps),
        "--warmup", str(args.warmup),
    ]
    if args.batch_size:
        cmd += ["--batch_size", str(args.batch_size)]
    if args.model != "base":
        cmd += ["--model", args.model]
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=args.timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        print(f"  {name}: TIMEOUT after {args.timeout}s", flush=True)
        return None
    line = next((ln for ln in reversed(out.stdout.splitlines())
                 if ln.startswith("{")), None)
    if out.returncode != 0 or line is None:
        tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
        print(f"  {name}: FAILED rc={out.returncode} {' | '.join(tail)}",
              flush=True)
        return None
    rec = json.loads(line)
    rec["config"] = name
    rec["xla_flags"] = flags
    print(f"  {name}: {rec['step_time_s'] * 1e3:.1f} ms "
          f"({rec['value']} {rec['unit']})", flush=True)
    return rec


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", default="wav2vec2",
                        choices=["whisper", "wav2vec2"])
    parser.add_argument("--model", default="base")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--timeout", type=int, default=900,
                        help="per-config subprocess timeout (fresh compiles)")
    parser.add_argument("--flags", default=None,
                        help="comma-separated subset of the menu "
                             f"({', '.join(FLAG_MENU)}); default: all")
    args = parser.parse_args()

    names = list(FLAG_MENU) if args.flags is None else args.flags.split(",")
    unknown = [n for n in names if n not in FLAG_MENU]
    if unknown:
        parser.error(f"unknown flag configs: {unknown}")

    print(f"sweep: {args.family}-{args.model}, {len(names)} configs",
          flush=True)
    results = [r for n in names if (r := run_one(n, FLAG_MENU[n], args))]
    results.sort(key=lambda r: r["step_time_s"])
    print(json.dumps({"ranked": [
        {"config": r["config"], "step_ms": round(r["step_time_s"] * 1e3, 2),
         "value": r["value"], "xla_flags": r["xla_flags"]}
        for r in results
    ]}, indent=2))


if __name__ == "__main__":
    main()
