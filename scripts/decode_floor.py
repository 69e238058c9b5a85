"""Analytic decode HBM floor per whisper size/batch (VERDICT r4 item 8).

Greedy decode is a pure HBM stream: per token each decoder layer streams
its weights (batch-amortized), the transposed cross-KV caches (B-scaled),
and the growing self-KV cache.  The floor is those bytes over the chip's
HBM bandwidth; the int8 column shows what halving the cross stream can
save at best.  Compare against measured ms/token from
scripts/bench_generate.py to see how far from light speed the decode is.

Usage: python scripts/decode_floor.py [--hbm_gbps 819] [--length 128]
"""

from __future__ import annotations

import argparse
import json

SIZES = {
    "base":   dict(L=6,  E=512,  ff=2048, V=51865),
    "medium": dict(L=24, E=1024, ff=4096, V=51865),
    # large-v1/v2 vocab is 51865; 51866 is v3's (extra <|yue|> token).
    "large":  dict(L=32, E=1280, ff=5120, V=51865),
    "large-v3": dict(L=32, E=1280, ff=5120, V=51866),
}


def floor_row(size: str, batch: int, hbm_gbps: float, tk: int = 1500,
              length: int = 128, dtype_bytes: int = 2):
    s = SIZES[size]
    L, E, ff, V = s["L"], s["E"], s["ff"], s["V"]
    # Decoder weights streamed once per token (cross K/V projections are
    # folded into the per-generate precompute, so excluded):
    dec_w = L * (4 * E * E + 2 * E * E + 2 * E * ff) + V * E
    w_bytes = dec_w * dtype_bytes
    cross = L * 2 * E * tk * dtype_bytes * batch
    self_kv = L * 2 * E * (length / 2) * dtype_bytes * batch  # avg fill
    total = w_bytes + cross + self_kv
    floor_ms = total / (hbm_gbps * 1e9) * 1e3
    int8_total = total - cross / 2
    return {
        "size": size, "batch": batch,
        "weights_mb": round(w_bytes / 1e6, 1),
        "cross_mb": round(cross / 1e6, 1),
        "self_mb": round(self_kv / 1e6, 1),
        "total_mb_per_token": round(total / 1e6, 1),
        "floor_ms_per_token": round(floor_ms, 3),
        "int8_cross_floor_ms": round(int8_total / (hbm_gbps * 1e9) * 1e3, 3),
        "int8_saving_pct": round(cross / 2 / total * 100, 1),
        # Ceiling if decoder WEIGHTS also streamed int8 (w8a-bf16 serving —
        # the next lever once the cross cache is quantized; weights are the
        # dominant stream at small batch x large model, e.g. 44% at large
        # b8).  Not implemented: recorded to frame the round-6 decision.
        "int8_w_and_cross_floor_ms": round(
            (total - cross / 2 - w_bytes / 2) / (hbm_gbps * 1e9) * 1e3, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hbm_gbps", type=float, default=819.0,
                   help="v5e HBM bandwidth")
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--sizes", nargs="+", default=["base", "medium", "large"],
                   choices=sorted(SIZES), help="sizes to print")
    args = p.parse_args()
    for size in args.sizes:
        for batch in (8, 16, 32):
            print(json.dumps(floor_row(size, batch, args.hbm_gbps,
                                       length=args.length)))


if __name__ == "__main__":
    main()
