"""Streaming training metrics.

The reference compiles Keras `Mean` / `SparseCategoricalAccuracy` metrics on
its models (reference speech_jobs/whisper_dist.py:904-910,
wav2vec2_dist.py:1280-1296) although its custom loops never update them; the
equivalents here are small pure accumulators that the loops *can* use (and
the jobs keep the reference behavior of not wiring them into the hot path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class Mean:
    """Streaming mean of scalar values."""

    def __init__(self, name: str = "mean"):
        self.name = name
        self.total = 0.0
        self.count = 0

    def update_state(self, value: float, weight: float = 1.0) -> None:
        self.total += float(value) * weight
        self.count += weight

    def result(self) -> float:
        return self.total / self.count if self.count else 0.0

    def reset_state(self) -> None:
        self.total, self.count = 0.0, 0


class SparseCategoricalAccuracy:
    """Streaming top-1 accuracy for integer labels."""

    def __init__(self, name: str = "accuracy"):
        self.name = name
        self.correct = 0
        self.count = 0

    def update_state(self, labels, logits) -> None:
        pred = jnp.argmax(logits, axis=-1)
        match = (pred == labels).astype(jnp.int32)
        self.correct += int(jnp.sum(match))
        self.count += int(match.size)

    def result(self) -> float:
        return self.correct / self.count if self.count else 0.0

    def reset_state(self) -> None:
        self.correct, self.count = 0, 0


def token_accuracy(logits: jax.Array, labels: jax.Array,
                   shift: bool = True) -> Tuple[jax.Array, jax.Array]:
    """In-graph (correct, total) for seq2seq token prediction; shift mirrors
    the teacher-forcing loss alignment."""
    if shift:
        logits = logits[:, :-1]
        labels = labels[:, 1:]
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels).astype(jnp.int32))
    return correct, jnp.asarray(labels.size, dtype=jnp.int32)
