"""Flat-buffer master params for the data-parallel trainer (OPT-IN).

Design: keep the master copy of the parameters as ONE chunk-padded f32
vector.

* The model still sees its normal pytree: `spec.unflatten(flat)` slices the
  vector at static, chunk-aligned offsets.  A custom VJP makes the gradient
  of unflatten a single concatenation — without it JAX would transpose each
  slice to a padded full-length vector and add ~80 of them.
* Gradients therefore EXIST only in flat form, so the entire clip → psum →
  clip → Adam chain is a handful of large 1-D ops, and the cross-replica
  gradient all-reduce is ONE collective instead of one per tensor.
* Keras `clipnorm` semantics (clip each variable by its own L2 norm,
  reference speech_jobs/wav2vec2_dist.py:1271-1275) are preserved on the
  flat vector: per-chunk partial sums of squares are segment-summed into
  per-variable norms (chunk → variable map is static), and the per-variable
  scale is gathered back per chunk.

Measured single-chip (BASELINE.md round-2 negative results): ~7-11 ms/step
SLOWER than the per-tensor pytree path for both families.  The pytree
optimizer was already near the HBM roofline (XLA fuses each tensor's
clip+Adam+apply into one fusion), while the flat<->pytree boundary forces
whole-vector relayout copies: param tensors live in (8,128)-tiled layouts,
a 1-D vector does not, and XLA materializes full-size layout conversions on
both sides.  Kept opt-in (`bench.py --flat_opt`, `flat_spec=` on
make_train_step) because on multi-HOST meshes one large all-reduce vs ~230
small ones is a different trade — revisit there before deleting.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

# One chunk = one (8, 128) f32 tile.  Every parameter tensor is padded to a
# whole number of chunks so per-variable reductions never straddle a chunk.
CHUNK = 1024


class FlatSpec:
    """Static layout of a parameter pytree inside one flat f32 vector."""

    def __init__(self, params_example: Any):
        leaves, treedef = jax.tree_util.tree_flatten(params_example)
        self.treedef = treedef
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        self.sizes = [int(np.prod(s)) for s in self.shapes]
        self.padded = [-(-n // CHUNK) * CHUNK for n in self.sizes]
        self.offsets = np.concatenate([[0], np.cumsum(self.padded)]).astype(
            np.int64)
        self.total = int(self.offsets[-1])
        self.n_chunks = self.total // CHUNK
        self.n_vars = len(leaves)
        chunk2var = np.zeros(self.n_chunks, dtype=np.int32)
        for i in range(self.n_vars):
            chunk2var[self.offsets[i] // CHUNK:self.offsets[i + 1] // CHUNK] = i
        self.chunk2var = chunk2var
        self._unflatten = self._build_unflatten()

    # -- flat <-> pytree ---------------------------------------------------

    def flatten(self, tree: Any) -> jax.Array:
        """Pytree -> [total] f32 vector (zero padding between tensors)."""
        leaves = jax.tree_util.tree_leaves(tree)
        parts = []
        for leaf, size, padded in zip(leaves, self.sizes, self.padded):
            flat = jnp.ravel(leaf).astype(jnp.float32)
            if padded != size:
                flat = jnp.pad(flat, (0, padded - size))
            parts.append(flat)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def unflatten(self, flat: jax.Array) -> Any:
        """[total] f32 -> pytree in the original dtypes.  Differentiable:
        the VJP is `flatten` of the cotangent tree (one concat)."""
        return self._unflatten(flat)

    def _unflatten_impl(self, flat: jax.Array) -> Any:
        leaves = []
        for i, (shape, dtype) in enumerate(zip(self.shapes, self.dtypes)):
            start = int(self.offsets[i])
            piece = jax.lax.slice(flat, (start,), (start + self.sizes[i],))
            leaves.append(piece.reshape(shape).astype(dtype))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def _build_unflatten(self):
        spec = self

        @jax.custom_vjp
        def unflatten(flat):
            return spec._unflatten_impl(flat)

        def fwd(flat):
            return spec._unflatten_impl(flat), None

        def bwd(_, cotangent_tree):
            return (spec.flatten(cotangent_tree),)

        unflatten.defvjp(fwd, bwd)
        return unflatten

    # -- per-variable norms on the flat vector -----------------------------

    def per_variable_sumsq(self, flat: jax.Array) -> jax.Array:
        """[n_vars] f32 sum-of-squares per original tensor.  Chunk partial
        sums + segment-sum: exact per-variable accumulation (no cumsum
        cancellation), one big reduction over the vector."""
        chunk_sq = jnp.sum(
            jnp.square(flat.reshape(self.n_chunks, CHUNK)), axis=1)
        return jax.ops.segment_sum(
            chunk_sq, jnp.asarray(self.chunk2var), num_segments=self.n_vars,
            indices_are_sorted=True)

    def broadcast_per_variable(self, values: jax.Array,
                               flat: jax.Array) -> jax.Array:
        """Multiply `flat` by a per-variable scalar ([n_vars])."""
        per_chunk = values[jnp.asarray(self.chunk2var)]      # [n_chunks]
        return (flat.reshape(self.n_chunks, CHUNK)
                * per_chunk[:, None]).reshape(-1)


def per_variable_clipnorm(spec: FlatSpec,
                          max_norm: float) -> optax.GradientTransformation:
    """Flat-vector version of dp.per_variable_clipnorm (Keras
    `Adam(clipnorm=...)`: each tensor clipped by its own L2 norm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = jnp.sqrt(spec.per_variable_sumsq(updates))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return spec.broadcast_per_variable(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def whisper_optimizer(learning_rate: float = 1e-4):
    """Flat twin of dp.whisper_optimizer — keras_adam works on the flat
    vector as a single-leaf pytree unchanged (Keras-exact epsilon
    placement; see dp.keras_adam)."""
    from tethys_tpu.parallel.dp import keras_adam

    return keras_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


def wav2vec2_optimizer(spec: FlatSpec, learning_rate: float = 3e-5):
    """Flat twin of dp.wav2vec2_optimizer: per-variable clipnorm(1.0) +
    Adam(eps=1e-8), reference wav2vec2_dist.py:1271-1275."""
    from tethys_tpu.parallel.dp import keras_adam

    return optax.chain(
        per_variable_clipnorm(spec, 1.0),
        keras_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
    )


def flat_optimizer(spec: FlatSpec, family: str, learning_rate: float):
    """Family-dispatching helper used by the jobs layer."""
    if family == "wav2vec2":
        return wav2vec2_optimizer(spec, learning_rate)
    return whisper_optimizer(learning_rate)
