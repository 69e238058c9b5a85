"""Shared helpers for job entry points (CLI parity with the reference)."""

from __future__ import annotations

import argparse
import os
import sys

# Allow running `python jobs/foo.py` without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-CPU fallback for tiny one-shot programs (model.init) — must happen
# before the first backend query.
from tethys_tpu.utils.device import enable_host_cpu  # noqa: E402

enable_host_cpu()


def add_common_flags(parser: argparse.ArgumentParser, num_batches_default: int,
                     batch_size_default: int) -> None:
    parser.add_argument(
        "--num_batches", type=int, default=num_batches_default,
        help=f"num_batches per replica, default is set {num_batches_default}",
    )
    parser.add_argument(
        "--batch_size", type=int, default=batch_size_default,
        help=f"batch size per replica, default is set {batch_size_default}",
    )
    # TPU extension (not in the reference CLI): run matmuls in bfloat16.
    parser.add_argument(
        "--dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="compute dtype (params stay float32)",
    )
    parser.add_argument(
        "--jax_profile", type=str, default=None, metavar="DIR",
        help="write a jax.profiler trace of the training run to DIR",
    )
