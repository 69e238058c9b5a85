"""Pallas flash attention for TPU (placeholder gate).

The real fused kernel lands in `flash_attention`; until it is implemented the
`supported` gate returns False so callers fall back to the XLA path.
"""

from __future__ import annotations


def supported(query, key, value, bias) -> bool:
    return False


def flash_attention(query, key, value, bias):  # pragma: no cover
    raise NotImplementedError
