"""ICI collective traffic accounting from compiled HLO.

The reference captures DCN traffic of the TF ring all-reduce with tcpdump
(reference network.sh:1-9).  On TPU the gradient all-reduce rides ICI, which
is invisible to the host NIC — so the equivalent observability is computed
*analytically*: walk the compiled HLO of the train step and sum the payload
bytes of every collective op.  This is exact (XLA's schedule is static) and
free at runtime.

`network.sh` still applies for DCN (multi-host) traffic and ships in
scripts/network.sh unchanged in spirit.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# Matches the op application `<op>[-start|-done][.N](` in an HLO rhs; a `%`
# before the name (an operand reference like `(%all-reduce.1)`) never matches
# because the operand is followed by `)`/`,`, not `(`.
_OP_RE = re.compile(
    r"\b(" + "|".join(_COLLECTIVES) + r")(-start|-done)?(?:\.\d+)?\("
)

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            n = int(np.prod([int(d) for d in dims.split(",")], dtype=np.int64))
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_traffic_report(hlo_text: str) -> Dict[str, Any]:
    """Per-collective-op byte accounting from HLO text
    (`jitted.lower(...).compile().as_text()`)."""
    ops = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if not (stripped.startswith("%") or stripped.startswith("ROOT")):
            continue
        body = stripped.split(" = ", 1)
        if len(body) != 2:
            continue
        rhs = body[1]
        m = _OP_RE.search(rhs)
        if m is None:
            continue
        op, suffix = m.group(1), m.group(2) or ""
        if suffix == "-done":
            continue  # payload already counted at the -start op
        # Result shape text: everything between " = " and the op name
        # (handles tuples with layout annotations and /*index=N*/ comments).
        nbytes = _shape_bytes(rhs[: m.start()])
        if suffix == "-start":
            nbytes //= 2  # async start tuples alias operand + result
        ops.append({"op": op, "bytes": nbytes, "hlo": stripped[:160]})
    by_kind: Dict[str, int] = {}
    for o in ops:
        by_kind[o["op"]] = by_kind.get(o["op"], 0) + o["bytes"]
    return {
        "num_collectives": len(ops),
        "total_bytes": sum(o["bytes"] for o in ops),
        "total_mb": sum(o["bytes"] for o in ops) / (1024 * 1024),
        "by_kind_bytes": by_kind,
        "ops": ops,
    }


def write_collective_report(hlo_text: str, task_type: str, task_index: int,
                            out_dir: Optional[str] = None) -> Optional[str]:
    """Write `<task>_<idx>_collectives.txt` next to the JCT file."""
    from tethys_tpu.utils.artifacts import read_model_name, result_dir

    report = collective_traffic_report(hlo_text)
    if out_dir is None:
        name = read_model_name()
        if name is None:
            return None
        out_dir = os.path.join(result_dir(), name)
    path = os.path.join(out_dir, f"{task_type}_{task_index}_collectives.txt")
    try:
        with open(path, "w") as f:
            f.write("kind,bytes_per_step\n")
            for kind, nbytes in sorted(report["by_kind_bytes"].items()):
                f.write(f"{kind},{nbytes}\n")
            f.write(f"total,{report['total_bytes']}\n")
        return path
    except OSError as e:
        print(f"collective report write failed: {e}")
        return None
