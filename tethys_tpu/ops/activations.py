"""Activation functions.

The reference uses *exact* (erf-based) GELU everywhere: Keras
`tf.keras.activations.gelu(approximate=False)` in Whisper
(reference speech_jobs/whisper_dist.py:196) and a hand-rolled erf GELU in
Wav2Vec2 (reference speech_jobs/wav2vec2_dist.py:132-136).  JAX's default is
the tanh approximation, so we pin `approximate=False` here; the erf lowers to
a cheap VPU op on TPU.
"""

import math

import jax
import jax.numpy as jnp


def gelu(x: jax.Array) -> jax.Array:
    """Exact-erf GELU: 0.5 * x * (1 + erf(x / sqrt(2))).

    Written out (not `jax.nn.gelu(approximate=False)`): that helper promotes
    bf16 inputs to f32 and returns f32, which silently doubles the HBM
    traffic of every FFN intermediate downstream — measured 0.32 ms for a
    single [16,100,2048] forward.  The erf itself still runs in f32 (exact
    math is the reference contract, golden-tested vs tf.math.erf); only the
    stored result returns to the compute dtype.
    """
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(
        x.dtype)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)
