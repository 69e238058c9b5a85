"""Activation functions.

The reference uses *exact* (erf-based) GELU everywhere: Keras
`tf.keras.activations.gelu(approximate=False)` in Whisper
(reference speech_jobs/whisper_dist.py:196) and a hand-rolled erf GELU in
Wav2Vec2 (reference speech_jobs/wav2vec2_dist.py:132-136).  JAX's default is
the tanh approximation, so we pin `approximate=False` here; the erf lowers to
a cheap VPU op on TPU.
"""

import jax
import jax.numpy as jnp


def gelu(x: jax.Array) -> jax.Array:
    """Exact-erf GELU: 0.5 * x * (1 + erf(x / sqrt(2)))."""
    return jax.nn.gelu(x, approximate=False)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)
