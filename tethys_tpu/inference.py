"""Inference utilities: transcription + text preprocessing.

Capability-parity with the reference's inference helpers:
* `preprocess_text` (reference speech_jobs/whisper_dist.py:770-780) —
  tokenize and wrap with BOS/EOS.
* `transcribe_audio` (reference speech_jobs/whisper_dist.py:962-986) — the
  reference uses a random waveform stand-in (audio I/O was never implemented,
  SURVEY quirk #11) and feeds the un-transposed feature matrix to the
  encoder; here the features are laid out correctly
  (audio.prepare_input_features) and decoding runs the KV-cached jit greedy
  loop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tethys_tpu.audio import prepare_input_features
from tethys_tpu.models.whisper import greedy_generate


def preprocess_text(text: str, tokenizer) -> list:
    """Tokenize and add BOS/EOS (tokenizer: any object with encode and
    bos_token_id/eos_token_id, e.g. a transformers tokenizer)."""
    tokens = tokenizer.encode(text)
    return [tokenizer.bos_token_id] + list(tokens) + [tokenizer.eos_token_id]


def transcribe_audio(
    model,
    variables,
    waveform: Optional[np.ndarray] = None,
    tokenizer=None,
    max_length: int = 448,
    sample_rate: int = 16000,
):
    """Waveform -> token ids (or text when a tokenizer is given).

    Like the reference, a missing waveform falls back to 30 s of random
    audio (reference whisper_dist.py:966-969).
    """
    if waveform is None:
        waveform = np.random.randn(sample_rate * 30).astype(np.float32)
    features = prepare_input_features(
        jnp.asarray(waveform, dtype=jnp.float32),
        n_frames=model.config.n_ctx * 2,
        n_mels=model.config.n_mels,
    )
    tokens, length = greedy_generate(
        model, variables, features, max_length=max_length
    )
    ids = np.asarray(tokens)[0, : int(length)]
    if tokenizer is not None:
        return tokenizer.decode(ids)
    return ids


def transcribe_long_audio(
    model,
    variables,
    waveform: np.ndarray,
    tokenizer=None,
    max_length: int = 448,
    sample_rate: int = 16000,
):
    """Arbitrary-length waveform -> per-window token ids (or joined text).

    The streaming serving path of the BASELINE.json stretch config: the
    waveform is chunked into exact-seam 30 s windows
    (audio.stream_log_mel — every frame bit-identical to a whole-signal
    STFT), the windows run through the encoder + KV-cached greedy decode
    as ONE batch.  The batch dimension is padded up to the next
    power-of-two bucket so recurring audio lengths reuse a handful of
    compiled programs instead of one per window count (TPU compiles are
    minutes-slow; an unpadded batch would recompile for every distinct
    length class).  Each window's tokens are cut at its own first EOS
    (the global decode only stops when EVERY window has finished, so
    early-finishing windows carry post-EOS argmax noise that must not
    reach the transcript).  Returns a list of per-window id arrays (EOS
    excluded), or the ' '-joined decoded text when a tokenizer is given.
    """
    from tethys_tpu.audio import prepare_streaming_features

    # Window length follows the model's context: n_ctx mel-frame pairs at
    # a 160-sample hop (n_ctx=1500 -> exactly 30.0 s).
    window_seconds = model.config.n_ctx * 2 * 160 / sample_rate
    features = prepare_streaming_features(
        jnp.asarray(waveform, dtype=jnp.float32),
        n_mels=model.config.n_mels, sample_rate=sample_rate,
        window_seconds=window_seconds,
    )
    n_windows = features.shape[0]
    bucket = 1 << (n_windows - 1).bit_length()  # next power of two
    if bucket > n_windows:
        pad = jnp.zeros((bucket - n_windows,) + features.shape[1:],
                        dtype=features.dtype)
        features = jnp.concatenate([features, pad], axis=0)
    tokens, length = greedy_generate(
        model, variables, features, max_length=max_length
    )
    toks = np.asarray(tokens)[:n_windows]
    n = int(np.asarray(length))
    eos = model.config.eos_token_id
    per_window = []
    for i in range(n_windows):
        row = toks[i, :n]
        hits = np.nonzero(row == eos)[0]
        per_window.append(row[: hits[0]] if hits.size else row)
    if tokenizer is not None:
        return " ".join(tokenizer.decode(ids) for ids in per_window)
    return per_window
