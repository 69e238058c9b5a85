"""Per-op profile of one family's jitted train step on the real TPU.

Reuses bench.py's model/step builders, captures an xplane trace of a few
steady-state steps, and prints the aggregated "XLA Ops" table (top ops by
self time plus a category rollup). Parsing protocol per BASELINE.md: the
tensorboard_plugin_profile converter is broken with the installed TF, so we
read the xplane proto directly (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python,
plane /device:TPU:0, line "XLA Ops").

Usage: python scripts/profile_step.py [--family wav2vec2] [--steps 5]
       [--batch_size N] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def op_key(name: str) -> str:
    """Defining-op name (``.N`` stripped) + output shape: groups per-layer
    clones of the same computation without merging unrelated fusions."""
    parts = name.split(" = ", 1)
    head = re.sub(r"\.\d+$", "", parts[0].strip())
    shape = ""
    if len(parts) > 1:
        m = re.match(r"([\w\[\],()]+)", parts[1])
        shape = m.group(1) if m else ""
    return f"{head} {shape}"


def categorize(name: str) -> str:
    head = op_key(name).lstrip("%")
    for cat, pat in (
        ("pallas-kernel", r"custom-call|flash|dropout"),
        ("conv", r"convolution"),
        ("matmul", r"^dot|einsum"),
        ("copy/transpose", r"^(copy|transpose|bitcast)"),
        ("fusion", r"fusion"),
        ("reduce", r"reduce|all-reduce"),
    ):
        if re.search(pat, head, re.I):
            return cat
    return "other"


def parse_xplane(logdir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name or "#Chip" in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9 / steps  # -> ms/step
    return per_op


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="wav2vec2",
                   choices=["wav2vec2", "whisper"])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--model", default="base")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default=None,
                   help="parse an existing trace instead of running one")
    p.add_argument("--flat_opt", action="store_true",
                   help="profile the flat-buffer optimizer path")
    p.add_argument("--master_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_layers", action="store_true",
                   help="per-layer nn.remat (medium/large capacity mode)")
    args = p.parse_args()

    logdir = args.logdir
    if logdir is None:
        logdir = tempfile.mkdtemp(prefix=f"prof_{args.family}_")
        run_trace(args, logdir)

    per_op = parse_xplane(logdir, args.steps)
    total = sum(per_op.values())
    if not per_op:
        raise SystemExit(
            f"no TPU 'XLA Ops' events found in {logdir} — CPU trace, empty "
            f"dir, or a runtime with a differently-named device plane?")
    if args.logdir is not None:
        print(f"note: normalizing by --steps={args.steps}; must match the "
              f"step count the trace was captured with", flush=True)
    print(f"\n=== {args.family} step: {total:.1f} ms device time/step "
          f"(trace {logdir}) ===")
    rollup = collections.Counter()
    grouped = collections.Counter()
    counts = collections.Counter()
    example = {}
    for name, ms in per_op.items():
        rollup[categorize(name)] += ms
        k = op_key(name)
        grouped[k] += ms
        counts[k] += 1
        example.setdefault(k, name)
    for cat, ms in rollup.most_common():
        print(f"  {cat:16s} {ms:7.2f} ms  {100*ms/total:5.1f}%")
    print(f"\n  top {args.top} op groups (xN = clones summed):")
    for k, ms in grouped.most_common(args.top):
        shape = example[k].split(" = ", 1)[-1][:90]
        print(f"  {ms:8.3f} ms x{counts[k]:<3d} {k[:40]:40s} {shape}")


def run_trace(args, logdir: str) -> None:
    """Trace the EXACT configuration bench.py measures (shared builder)."""
    import bench
    from tethys_tpu.utils.device import enable_host_cpu

    enable_host_cpu()
    import jax

    from tethys_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    (state, step, batch, probe, _audio, _tag,
     args) = bench.build_family_step(args, args.family)
    rng = jax.random.PRNGKey(0)

    for i in range(3):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
    probe(state), float(loss)

    with jax.profiler.trace(logdir):
        for i in range(args.steps):
            state, loss = step(state, batch, jax.random.fold_in(rng, 100 + i))
        probe(state), float(loss)


if __name__ == "__main__":
    main()
