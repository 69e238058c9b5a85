"""Loss functions for both model families.

Semantics are kept bit-faithful to the reference (quirks included, flagged):

* `seq2seq_shifted_ce` — Whisper teacher-forcing loss: CE of logits[:, :-1]
  vs labels[:, 1:]; plain mean unless a decoder mask is given, then
  padding-masked mean (reference speech_jobs/whisper_dist.py:583-600).
* `contrastive_loss` / `sample_negative_indices` — Wav2Vec2 InfoNCE with the
  reference's vectorized sampler: per-batch top-k of uniform random draws,
  tiled across time so every timestep shares the same negative set, with
  repeat-tiling when the sequence is shorter than num_negatives
  (reference speech_jobs/wav2vec2_dist.py:907-937, 866-899).
* `diversity_loss` = -perplexity — NOT the HF (GV-perplexity)/GV form; this is
  a deliberate reference quirk (wav2vec2_dist.py:901-905).
* `ctc_loss` — real CTC (blank=0, lengths from masks, zero-infinity and
  mean/sum reduction switches) matching the base-only reference jobs
  (reference stable_jobs/wav2vec2_dist.py:897-929); `dummy_ctc_loss` is the
  CE-vs-zeros stand-in used by the size-parameterized jobs
  (reference speech_jobs/wav2vec2_dist.py:994-1001).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def seq2seq_shifted_ce(
    logits: jax.Array,                         # [B, T, V]
    labels: jax.Array,                         # [B, T] int
    decoder_attention_mask: Optional[jax.Array] = None,  # [B, T] {0,1}
) -> jax.Array:
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    ce = optax.softmax_cross_entropy_with_integer_labels(shift_logits, shift_labels)
    if decoder_attention_mask is not None:
        mask = decoder_attention_mask[:, :-1].astype(ce.dtype)
        return jnp.sum(ce * mask) / jnp.sum(mask)
    return jnp.mean(ce)


def sample_negative_indices(
    rng: jax.Array,
    batch_size: int,
    sequence_length: int,
    num_negatives: int,
) -> jax.Array:
    """[B, T, num_negatives] int32 time indices, identical per timestep.

    Reference semantics: draw [B, T] uniform ints in [0, T), take the top-k
    positions of (-draws) — i.e. k pseudo-random positions per batch row —
    then tile across the time axis; if T-1 < num_negatives, clamp k to
    max(T-1, 1) and repeat-tile up to num_negatives.
    """
    actual = max(min(num_negatives, sequence_length - 1), 1)
    draws = jax.random.randint(
        rng, (batch_size, sequence_length), 0, sequence_length, dtype=jnp.int32
    )
    _, top_indices = jax.lax.top_k(-draws.astype(jnp.float32), actual)
    if actual < num_negatives:
        repeats = -(-num_negatives // actual)
        top_indices = jnp.tile(top_indices, (1, repeats))[:, :num_negatives]
    else:
        top_indices = top_indices[:, :num_negatives]
    return jnp.broadcast_to(
        top_indices[:, None, :], (batch_size, sequence_length, num_negatives)
    )


def contrastive_loss(
    hidden_states: jax.Array,      # [B, T, D] projected transformer features
    quantized_states: jax.Array,   # [B, T, D] projected quantized targets
    rng: jax.Array,
    num_negatives: int = 100,
    temperature: float = 0.1,
    negative_indices: Optional[jax.Array] = None,  # [B, K] override (parity)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (logits [B, T, 1+K], scalar mean CE vs label 0).

    `negative_indices` injects a fixed per-batch negative set (the sampler
    tiles one set across time anyway); used by the TF-reference parity
    harness to compare losses on matched negatives.
    """
    h = hidden_states.astype(jnp.float32)
    q = quantized_states.astype(jnp.float32)
    b, t, _ = h.shape

    pos_logits = jnp.sum(h * q, axis=-1) / temperature  # [B, T]
    if num_negatives > 0:
        if negative_indices is None:
            neg_idx = sample_negative_indices(
                rng, b, t, num_negatives)[:, 0, :]        # [B, K]
        else:
            neg_idx = negative_indices
        # The sampler tiles the same negative set across time (reference
        # semantics), so gather only [B, K, D] and take the dot products as
        # one MXU matmul instead of materializing the [B, T, K, D] broadcast
        # tensor the reference builds (330 MB at base/batch-32).
        neg_q = jnp.take_along_axis(
            q, neg_idx[:, :, None], axis=1)               # [B, K, D]
        neg_logits = jnp.einsum(
            "btd,bkd->btk", h, neg_q,
            preferred_element_type=jnp.float32) / temperature
        logits = jnp.concatenate([pos_logits[:, :, None], neg_logits], axis=2)
    else:
        logits = pos_logits[:, :, None]

    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.zeros((b, t), dtype=jnp.int32)
    )
    return logits, jnp.mean(loss)


def diversity_loss(perplexity: jax.Array) -> jax.Array:
    """Reference quirk: plain negative perplexity (wav2vec2_dist.py:901-905)."""
    return -perplexity


def ctc_loss(
    logits: jax.Array,            # [B, T, V]
    labels: jax.Array,            # [B, L] int; 0 is both padding and blank
    attention_mask: Optional[jax.Array] = None,  # [B, T] frame validity
    blank_id: int = 0,
    zero_infinity: bool = False,
    reduction: str = "sum",
) -> jax.Array:
    """Real CTC loss (optax) with the reference's conventions:
    blank=0, label lengths counted as labels>0, logit lengths from the mask.
    """
    logits = logits.astype(jnp.float32)
    b, t, _ = logits.shape
    if attention_mask is not None:
        logit_paddings = 1.0 - attention_mask.astype(jnp.float32)
    else:
        logit_paddings = jnp.zeros((b, t), dtype=jnp.float32)
    label_paddings = (labels <= 0).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, labels.astype(jnp.int32), label_paddings,
        blank_id=blank_id,
    )
    if zero_infinity:
        per_seq = jnp.where(jnp.isinf(per_seq), 0.0, per_seq)
    if reduction == "mean":
        return jnp.mean(per_seq)
    if reduction == "sum":
        return jnp.sum(per_seq)
    return per_seq


def dummy_ctc_loss(logits: jax.Array) -> jax.Array:
    """CE against all-zero labels — the stand-in 'CTC' used by the
    size-parameterized reference jobs (wav2vec2_dist.py:994-1001)."""
    logits = logits.astype(jnp.float32)
    labels = jnp.zeros(logits.shape[:-1], dtype=jnp.int32)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def classification_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels.astype(jnp.int32)
        )
    )
