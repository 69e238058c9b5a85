"""Model / job configuration dataclasses with the reference's size presets.

Mirrors the hyperparameter surfaces of the reference config classes
(`WhisperConfig`, reference speech_jobs/whisper_dist.py:10-45 and
`Wav2Vec2Config`, reference speech_jobs/wav2vec2_dist.py:24-128) including
their quirks (e.g. the nonstandard Whisper "small" preset: d_model=768 with
only 4+4 layers).  One addition for TPU: a `compute_dtype` knob — params stay
float32, activations/matmuls can run in bfloat16 on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float64,  # CPU-only; used by numeric-drift probes/tests
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name):
    if not isinstance(name, str):
        return name
    return _DTYPES[name]


@dataclasses.dataclass
class WhisperConfig:
    """Whisper encoder-decoder hyperparameters.

    Defaults correspond to the reference's (nonstandard) "small" preset:
    d_model=768 but only 4 encoder + 4 decoder layers
    (reference speech_jobs/whisper_dist.py:10-45).
    """

    d_model: int = 768
    encoder_layers: int = 4
    encoder_attention_heads: int = 12
    decoder_layers: int = 4
    decoder_attention_heads: int = 12
    d_ff: int = 3072

    # Encoder (audio) side.
    n_mels: int = 80
    n_ctx: int = 1500  # max mel-frame context after the stride-2 conv (30 s)

    # Decoder (text) side.
    vocab_size: int = 51865
    max_target_positions: int = 448

    # Training.
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_function: str = "gelu"

    layer_norm_eps: float = 1e-5
    init_std: float = 0.02

    # Special tokens.
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 50257  # <|startoftranscript|>

    use_cache: bool = True

    # TPU additions (not part of the reference surface).
    compute_dtype: str = "float32"
    use_flash_attention: bool = True  # Pallas flash attention for long self-attn
    # Per-layer rematerialization: wrap each encoder/decoder layer in
    # nn.remat so the backward holds only layer-boundary activations and
    # recomputes each layer's interior on demand.  Strictly stronger than
    # the whole-loss jax.checkpoint in dp.make_train_step(remat=True): a
    # single loss-level region re-runs the forward once and then holds ALL
    # intermediates live during the backward (peak ~= no-remat), which is
    # what made whisper-large spill (BASELINE.md round-3: 326 s/step).
    remat_layers: bool = False
    # Remat policy for remat_layers.  "save_flash" saves the flash-attention
    # kernel outputs (o, lse — checkpoint_name-tagged in the custom_vjp fwd
    # rule) so the backward reuses them instead of re-running the forward
    # kernel during recompute: ~32 MB/layer at whisper-large b8 for ~1/3 of
    # the flash kernel time back.  "none" recomputes everything.
    remat_policy: str = "save_flash"
    # Serving: quantize the per-generate cross-attention KV caches.  "none"
    # keeps them in compute dtype; "int8" stores int8 values + one f32 scale
    # per cache column (per encoder position, per head) — halves the
    # dominant decode HBM stream (ops/pallas_decode.py; the XLA int8 einsum
    # by default, TETHYS_Q8_XLA=0 for the pallas kernel).  int8 is the
    # RECOMMENDED serving mode and bench_generate's default since the
    # round-5 ladder A/B (+25%/+28% tokens/s at medium/large, wash at
    # base); the config default stays "none" so training-parity paths and
    # the reference greedy token-identity contract are bit-exact.  Greedy
    # tokens under int8 can differ from the bf16 cache in near-tie argmax
    # steps (logit error ~4e-4 rel at realistic scale, test-pinned).
    kv_quant: str = "none"

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)

    @classmethod
    def from_size(cls, model_type: str = "small", **overrides) -> "WhisperConfig":
        """Size presets matching reference create_whisper_model
        (speech_jobs/whisper_dist.py:852-890)."""
        presets = {
            "tiny": dict(d_model=384, encoder_layers=4, encoder_attention_heads=6,
                         decoder_layers=4, decoder_attention_heads=6, d_ff=1536),
            "base": dict(d_model=512, encoder_layers=6, encoder_attention_heads=8,
                         decoder_layers=6, decoder_attention_heads=8, d_ff=2048),
            # "small" keeps the dataclass defaults (768-d, 4+4 layers — reference quirk).
            "small": dict(),
            "medium": dict(d_model=1024, encoder_layers=24, encoder_attention_heads=16,
                           decoder_layers=24, decoder_attention_heads=16, d_ff=4096),
            "large": dict(d_model=1280, encoder_layers=32, encoder_attention_heads=20,
                          decoder_layers=32, decoder_attention_heads=20, d_ff=5120),
            # OpenAI whisper-large-v3: same trunk as large but a 128-bin
            # mel frontend and the v2/v3 tokenizer (+1 language token).
            # The BASELINE.json stretch config ("Whisper large-v3 ...
            # streaming fused log-mel frontend"); not in the reference's
            # preset table (whisper_dist.py:852-890 stops at "large").
            "large-v3": dict(d_model=1280, encoder_layers=32,
                             encoder_attention_heads=20, decoder_layers=32,
                             decoder_attention_heads=20, d_ff=5120,
                             n_mels=128, vocab_size=51866,
                             decoder_start_token_id=50258),
        }
        kwargs = dict(presets[model_type])
        kwargs.update(overrides)
        return cls(**kwargs)


@dataclasses.dataclass
class Wav2Vec2Config:
    """Wav2Vec2 hyperparameters with tiny/small/base presets
    (reference speech_jobs/wav2vec2_dist.py:24-128)."""

    model_size: str = "small"

    hidden_size: int = 512
    num_hidden_layers: int = 6
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    conv_dim: Tuple[int, ...] = (256, 256, 256, 256, 256)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 2)
    num_conv_pos_embeddings: int = 64
    num_conv_pos_embedding_groups: int = 8

    # Feature extractor.
    feat_extract_norm: str = "group"
    feat_extract_activation: str = "gelu"
    conv_bias: bool = False

    # Common.
    hidden_act: str = "gelu"
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-5

    # Quantizer.
    num_codevectors_per_group: int = 160
    num_codevector_groups: int = 2
    codevector_dim: int = 128
    proj_codevector_dim: int = 128

    # Quirk #13: the reference declares codevectors trainable=True
    # (wav2vec2_dist.py:570-575) but as a raw tf.Variable attribute, which
    # Keras 3 does NOT track — it never appears in model.trainable_variables
    # (or model.variables), so optimizer.apply_gradients never updates it,
    # it is excluded from the tf.clip_by_global_norm set, and it is absent
    # from reference checkpoints.  The reference codebook is therefore
    # FROZEN at its random init (BEST-RQ-style).  Default True for exact
    # trajectory parity; set False to actually train the codebook
    # (extension).
    freeze_codevectors: bool = True

    contrastive_logits_temperature: float = 0.1
    num_negatives: int = 100
    diversity_loss_weight: float = 0.1
    ctc_loss_reduction: str = "sum"
    ctc_zero_infinity: bool = False

    # Masking (SpecAugment-style; like the reference, utilities exist but the
    # training paths do not call them — reference wav2vec2_dist.py:1073-1119).
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10

    vocab_size: int = 32
    do_stable_layer_norm: bool = True
    use_weighted_layer_sum: bool = False

    classifier_proj_size: int = 128
    num_labels: int = 10

    tdnn_dim: Tuple[int, ...] = (256, 256, 256, 256, 768)
    xvector_output_dim: int = 256
    tdnn_kernel: Tuple[int, ...] = (5, 3, 3, 1, 1)
    tdnn_dilation: Tuple[int, ...] = (1, 2, 3, 1, 1)

    # TPU additions.
    compute_dtype: str = "float32"
    # Stack the identical encoder layers as [L, ...] params and run them via
    # nn.scan (one compiled layer body, weight-grads accumulated per
    # iteration) instead of 12 unrolled copies.  Same math; layouts are
    # interconvertible via models.wav2vec2.stack_layer_params/unstack.
    scan_layers: bool = False

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)

    @classmethod
    def from_size(cls, model_size: str = "small", **overrides) -> "Wav2Vec2Config":
        presets = {
            "small": dict(
                hidden_size=512, num_hidden_layers=6, num_attention_heads=8,
                intermediate_size=2048,
                conv_dim=(256,) * 5, conv_stride=(5, 2, 2, 2, 2),
                conv_kernel=(10, 3, 3, 3, 2),
                num_conv_pos_embeddings=64, num_conv_pos_embedding_groups=8,
                num_codevectors_per_group=160, codevector_dim=128,
                proj_codevector_dim=128, classifier_proj_size=128,
                tdnn_dim=(256, 256, 256, 256, 768), xvector_output_dim=256,
            ),
            "tiny": dict(
                hidden_size=256, num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=1024,
                conv_dim=(128,) * 4, conv_stride=(5, 2, 2, 2),
                conv_kernel=(10, 3, 3, 2),
                num_conv_pos_embeddings=32, num_conv_pos_embedding_groups=4,
                num_codevectors_per_group=80, codevector_dim=64,
                proj_codevector_dim=64, classifier_proj_size=64,
                tdnn_dim=(128, 128, 128, 128, 384), xvector_output_dim=128,
            ),
            "base": dict(
                hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                intermediate_size=3072,
                conv_dim=(512,) * 7, conv_stride=(5, 2, 2, 2, 2, 2, 2),
                conv_kernel=(10, 3, 3, 3, 3, 2, 2),
                num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
                num_codevectors_per_group=320, codevector_dim=256,
                proj_codevector_dim=256, classifier_proj_size=256,
                tdnn_dim=(512, 512, 512, 512, 1500), xvector_output_dim=512,
            ),
        }
        kwargs = dict(presets[model_size])
        kwargs["model_size"] = model_size
        kwargs.update(overrides)
        return cls(**kwargs)

    def downsampled_length(self, input_length: int) -> int:
        """Post-conv sequence length for a raw waveform of `input_length`
        samples, using TF/XLA 'SAME' padding arithmetic (ceil division)."""
        length = input_length
        for stride in self.conv_stride:
            length = -(-length // stride)
        return length
