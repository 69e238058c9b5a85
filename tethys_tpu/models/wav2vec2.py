"""Wav2Vec2 model family (self-supervised pretraining, CTC-ASR, classification)
as pure flax.linen modules.

Capability-parity rebuild of the reference Keras implementation
(reference speech_jobs/wav2vec2_dist.py:24-1067), TPU-first:

* the strided conv feature encoder runs as XLA convs in `compute_dtype`
  (MXU), with SAME padding matching TF's ceil-division arithmetic,
* the hard product quantizer is computed with one batched distance matmul per
  group (|h|² - 2 h·c + |c|²) instead of materializing the [B,T,V,d] broadcast
  difference tensor the reference builds — same argmin, far less HBM traffic,
* static shapes: the TF empty-batch short-circuit
  (reference wav2vec2_dist.py:589-600) is a dynamic-shape artifact that cannot
  occur under jit and is intentionally dropped.

Parity notes (vs reference lines):
* GroupNorm uses `num_conv_pos_embedding_groups` groups with joint
  (time, channel-in-group) moments — reference quirk (wav2vec2_dist.py:140-196).
* pos_conv_embed: grouped conv, no activation, bias on (wav2vec2_dist.py:274-280).
* quantize targets are the *projected* features after LN+dropout
  (wav2vec2_dist.py:781-790).
* `do_stable_layer_norm=True` → pre-LN blocks (wav2vec2_dist.py:402-460).
* hard argmin quantizer: gradients reach the codebook only through the
  one-hot @ codebook matmul; the projection receives none (deliberate
  reference behavior, do not "fix" to Gumbel — wav2vec2_dist.py:564-667).
* CTC head uses the dummy CE-vs-zeros loss by default (wav2vec2_dist.py:994-1001)
  and real CTC when `real_ctc=True` (stable_jobs/wav2vec2_dist.py:897-929).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tethys_tpu.configs import Wav2Vec2Config
from tethys_tpu import losses
from tethys_tpu.ops.activations import gelu
from tethys_tpu.ops.attention import multi_head_attention
from tethys_tpu.ops.masks import padding_additive_mask
from tethys_tpu.ops.norms import ReferenceGroupNorm
from tethys_tpu.ops.pallas_dropout import module_dropout

DenseInit = nn.initializers.glorot_uniform()


class Wav2Vec2FeatureExtractor(nn.Module):
    """Raw waveform [B, T] -> conv features [B, T/prod(stride), conv_dim[-1]]."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, inputs: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        x = inputs[:, :, None].astype(cfg.dtype)  # [B, T, 1]
        for i, (dim, kernel, stride) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            x = nn.Conv(
                dim, kernel_size=(kernel,), strides=(stride,), padding="SAME",
                use_bias=cfg.conv_bias, dtype=cfg.dtype, kernel_init=DenseInit,
                name=f"conv_{i}",
            )(x)
            if cfg.feat_extract_norm == "group":
                x = ReferenceGroupNorm(
                    groups=cfg.num_conv_pos_embedding_groups,
                    dtype=cfg.dtype, name=f"norm_{i}",
                )(x)
            else:
                x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                                 name=f"norm_{i}")(x)
            x = gelu(x) if cfg.feat_extract_activation == "gelu" else nn.relu(x)

        pos = nn.Conv(
            cfg.conv_dim[-1], kernel_size=(cfg.num_conv_pos_embeddings,),
            padding="SAME", feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=cfg.dtype, kernel_init=DenseInit, name="pos_conv_embed",
        )(x)
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        x = module_dropout(self, x, cfg.hidden_dropout, deterministic)
        return x


class Wav2Vec2Attention(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask=None,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.config
        embed_dim = cfg.hidden_size
        num_heads = cfg.num_attention_heads
        head_dim = embed_dim // num_heads

        dense = lambda name: nn.Dense(  # noqa: E731
            embed_dim, use_bias=True, dtype=cfg.dtype, kernel_init=DenseInit,
            name=name,
        )

        def split_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)

        # The reference scales scores by head_dim^-0.5 after QK^T
        # (wav2vec2_dist.py:350); scaling q first is identical.
        q = split_heads(dense("q_proj")(x) * head_dim ** -0.5)
        k = split_heads(dense("k_proj")(x))
        v = split_heads(dense("v_proj")(x))

        bias = None
        if attention_mask is not None:
            bias = padding_additive_mask(attention_mask, scale=-10000.0)

        rng = None
        if not deterministic and cfg.attention_dropout > 0.0:
            rng = self.make_rng("dropout")
        attn = multi_head_attention(
            q, k, v, bias=bias, dropout_rate=cfg.attention_dropout,
            dropout_rng=rng, deterministic=deterministic,
        )
        b, _, s, _ = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, embed_dim)
        return dense("out_proj")(attn)


class Wav2Vec2FeedForward(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     kernel_init=DenseInit, name="intermediate_dense")(x)
        x = gelu(x)
        x = module_dropout(self, x, cfg.activation_dropout, deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     kernel_init=DenseInit, name="output_dense")(x)
        x = module_dropout(self, x, cfg.hidden_dropout, deterministic)
        return x


class Wav2Vec2EncoderLayer(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask=None,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.config
        attn = Wav2Vec2Attention(cfg, name="attention")
        attn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                               name="attention_layer_norm")
        ff = Wav2Vec2FeedForward(cfg, name="feed_forward")
        ff_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                             name="feed_forward_layer_norm")

        if cfg.do_stable_layer_norm:
            # Pre-LN residual blocks.
            a = attn(attn_ln(x), attention_mask, deterministic=deterministic)
            x = x + module_dropout(self, a, cfg.hidden_dropout, deterministic)
            x = x + ff(ff_ln(x), deterministic=deterministic)
        else:
            a = attn(x, attention_mask, deterministic=deterministic)
            x = attn_ln(
                x + module_dropout(self, a, cfg.hidden_dropout, deterministic))
            x = ff_ln(x + ff(x, deterministic=deterministic))
        return x


class Wav2Vec2Encoder(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask=None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        cfg = self.config
        # Sequence-parallel hook (no-op unless a trainer installed
        # ops.sharding.seq_axis_rules — same mechanism as the Whisper
        # encoder; closes the round-2 asymmetry where SP was whisper-only).
        # Wav2Vec2's post-conv T is short (~100 for 2 s clips) so SP pays
        # off only for long-audio configs, but the hooks make the sp
        # trainer model-agnostic either way.
        from tethys_tpu.ops.sharding import seq_constrain

        x = seq_constrain(x)
        if cfg.scan_layers:
            x, stacked = self._scanned_layers(x, attention_mask, deterministic)
            if cfg.use_weighted_layer_sum:
                x = self._weighted_layer_sum(stacked)
        elif cfg.use_weighted_layer_sum:
            layer_outputs = []
            for i in range(cfg.num_hidden_layers):
                x = Wav2Vec2EncoderLayer(cfg, name=f"layers_{i}")(
                    x, attention_mask, deterministic=deterministic
                )
                x = seq_constrain(x)  # re-pin 'seq' after every layer
                layer_outputs.append(x)
            x = self._weighted_layer_sum(jnp.stack(layer_outputs, axis=0))
        else:
            for i in range(cfg.num_hidden_layers):
                x = Wav2Vec2EncoderLayer(cfg, name=f"layers_{i}")(
                    x, attention_mask, deterministic=deterministic
                )
                x = seq_constrain(x)
        return {"last_hidden_state": x}

    def _scanned_layers(self, x, attention_mask, deterministic):
        """Run the identical layers as one nn.scan over [L, ...]-stacked
        params: the layer body compiles once and the per-layer weight-grad
        dots accumulate into the stacked buffers (cfg.scan_layers)."""
        cfg = self.config

        def body(layer: Wav2Vec2EncoderLayer, carry):
            from tethys_tpu.ops.sharding import seq_constrain

            out = layer(carry, attention_mask, deterministic=deterministic)
            out = seq_constrain(out)  # re-pin 'seq' each scan step
            return out, (out if cfg.use_weighted_layer_sum else None)

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_hidden_layers,
        )
        return scan(Wav2Vec2EncoderLayer(cfg, name="layers"), x)

    def _weighted_layer_sum(self, stacked):
        cfg = self.config
        weights = self.param(
            "layer_weights",
            lambda key, shape: jnp.full(shape, 1.0 / cfg.num_hidden_layers),
            (cfg.num_hidden_layers,),
        )
        norm_weights = jax.nn.softmax(weights, axis=-1)
        return jnp.einsum("l,lbth->bth", norm_weights.astype(stacked.dtype),
                          stacked)


class Wav2Vec2ProjectionHead(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        x = nn.Dense(cfg.proj_codevector_dim, dtype=cfg.dtype,
                     kernel_init=DenseInit, name="projection_head")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        x = module_dropout(self, x, cfg.hidden_dropout, deterministic)
        return x


class Wav2Vec2Quantizer(nn.Module):
    """Hard (argmin) product quantizer — NOT Gumbel-softmax, by design."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> Dict[str, jax.Array]:
        cfg = self.config
        groups = cfg.num_codevector_groups
        vectors = cfg.num_codevectors_per_group
        group_dim = cfg.codevector_dim // groups

        codevectors = self.param(
            "codevectors", nn.initializers.normal(stddev=1.0),
            (groups, vectors, group_dim), jnp.float32,
        )
        if cfg.freeze_codevectors:
            # Quirk #13 (see configs.Wav2Vec2Config): the reference's
            # codevectors tf.Variable is untracked by Keras 3, so its
            # optimizer never updates it and its (in-graph, nonzero)
            # gradient never enters the global-norm clip.  stop_gradient
            # reproduces that exactly — zero grad, zero Adam update, zero
            # norm contribution — and composes with every parallel path.
            codevectors = jax.lax.stop_gradient(codevectors)
        projected = nn.Dense(cfg.codevector_dim, dtype=cfg.dtype,
                             kernel_init=DenseInit,
                             name="project_to_codevector_dim")(hidden_states)

        b, t, _ = projected.shape
        h = projected.reshape(b, t, groups, group_dim).astype(jnp.float32)
        h = h.transpose(2, 0, 1, 3)  # [G, B, T, d]

        # Squared-L2 distances via one matmul per group (batched over G):
        # ||h - c||² = ||h||² - 2 h·c + ||c||²  → argmin identical to the
        # reference's broadcast-difference form, MXU-friendly.
        h_sq = jnp.sum(jnp.square(h), axis=-1, keepdims=True)          # [G,B,T,1]
        c_sq = jnp.sum(jnp.square(codevectors), axis=-1)               # [G,V]
        cross = jnp.einsum("gbtd,gvd->gbtv", h, codevectors,
                           preferred_element_type=jnp.float32)
        distances = h_sq - 2.0 * cross + c_sq[:, None, None, :]        # [G,B,T,V]

        indices = jnp.argmin(distances, axis=-1)                       # [G,B,T]
        encodings = jax.nn.one_hot(indices, vectors, dtype=jnp.float32)
        quantized = jnp.einsum("gbtv,gvd->gbtd", encodings, codevectors)
        quantized = quantized.transpose(1, 2, 0, 3).reshape(
            b, t, cfg.codevector_dim
        ).astype(cfg.dtype)

        avg_probs = jnp.mean(encodings, axis=(1, 2))                   # [G, V]
        avg_probs = jnp.clip(avg_probs, 1e-10, 1.0)
        perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10), axis=-1)
        )
        perplexity = jnp.mean(perplexity)

        return {
            "quantized_features": quantized,
            "encodings": encodings,
            "distances": distances,
            "codevector_perplexity": perplexity,
        }


class Wav2Vec2Model(nn.Module):
    config: Wav2Vec2Config

    def setup(self):
        cfg = self.config
        self.feature_extractor = Wav2Vec2FeatureExtractor(cfg)
        self.feature_projection = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                           kernel_init=DenseInit)
        self.feature_projection_layer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype
        )
        self.feature_projection_dropout = nn.Dropout(cfg.hidden_dropout)
        self.encoder = Wav2Vec2Encoder(cfg)
        self.quantizer = Wav2Vec2Quantizer(cfg)
        self.project_hid = Wav2Vec2ProjectionHead(cfg)
        self.project_q = Wav2Vec2ProjectionHead(cfg)

    def __call__(
        self,
        inputs: jax.Array,                   # [B, T] raw waveform
        attention_mask: Optional[jax.Array] = None,
        training: bool = False,
        deterministic: Optional[bool] = None,
    ) -> Dict[str, jax.Array]:
        deterministic = (not training) if deterministic is None else deterministic
        extract_features = self.feature_extractor(
            inputs, deterministic=deterministic
        )
        hidden = self.feature_projection(extract_features)
        hidden = self.feature_projection_layer_norm(hidden)
        hidden = self.feature_projection_dropout(hidden, deterministic=deterministic)

        result: Dict[str, jax.Array] = {"extract_features": extract_features}
        if training:
            # Quantize the *projected* features (reference wav2vec2_dist.py:781-790).
            quantized = self.quantizer(hidden)
            result["quantized_features"] = quantized["quantized_features"]
            result["codevector_perplexity"] = quantized["codevector_perplexity"]

        encoder_outputs = self.encoder(
            hidden, attention_mask=attention_mask, deterministic=deterministic
        )
        result["last_hidden_state"] = encoder_outputs["last_hidden_state"]
        return result


class Wav2Vec2ForPreTraining(nn.Module):
    config: Wav2Vec2Config

    def setup(self):
        self.wav2vec2 = Wav2Vec2Model(self.config)

    def __call__(self, inputs, attention_mask=None, training: bool = False,
                 deterministic=None):
        deterministic = (not training) if deterministic is None else deterministic
        outputs = self.wav2vec2(
            inputs, attention_mask=attention_mask, training=training,
            deterministic=deterministic,
        )
        if training and "quantized_features" in outputs:
            outputs["projected_states"] = self.wav2vec2.project_hid(
                outputs["last_hidden_state"], deterministic=deterministic
            )
            outputs["projected_quantized_features"] = self.wav2vec2.project_q(
                outputs["quantized_features"], deterministic=deterministic
            )
        return outputs

    def compute_loss(self, outputs: Dict[str, jax.Array], rng: jax.Array):
        return pretraining_loss(self.config, outputs, rng)


def pretraining_loss(config: Wav2Vec2Config, outputs: Dict[str, jax.Array],
                     rng: jax.Array):
    """Contrastive + weighted diversity loss (reference
    wav2vec2_dist.py:1203-1221). Returns (loss, aux dict)."""
    logits, contrastive = losses.contrastive_loss(
        outputs["projected_states"],
        outputs["projected_quantized_features"],
        rng,
        num_negatives=config.num_negatives,
        temperature=config.contrastive_logits_temperature,
    )
    diversity = losses.diversity_loss(outputs["codevector_perplexity"])
    loss = contrastive + config.diversity_loss_weight * diversity
    return loss, {
        "contrastive_loss": contrastive,
        "diversity_loss": diversity,
        "logits": logits,
    }


class Wav2Vec2ForCTC(nn.Module):
    config: Wav2Vec2Config
    real_ctc: bool = False  # stable_jobs variant uses the real CTC loss

    def setup(self):
        self.wav2vec2 = Wav2Vec2Model(self.config)
        self.dropout = nn.Dropout(self.config.hidden_dropout)
        self.lm_head = nn.Dense(self.config.vocab_size, dtype=self.config.dtype,
                                kernel_init=DenseInit)

    def __call__(self, inputs, attention_mask=None, labels=None,
                 training: bool = False, deterministic=None) -> Dict[str, Any]:
        deterministic = (not training) if deterministic is None else deterministic
        outputs = self.wav2vec2(
            inputs, attention_mask=attention_mask, training=training,
            deterministic=deterministic,
        )
        hidden = self.dropout(outputs["last_hidden_state"],
                              deterministic=deterministic)
        logits = self.lm_head(hidden)

        loss = None
        if training and labels is not None:
            if self.real_ctc:
                loss = losses.ctc_loss(
                    logits, labels,
                    attention_mask=None,
                    blank_id=0,
                    zero_infinity=self.config.ctc_zero_infinity,
                    reduction=self.config.ctc_loss_reduction,
                )
            else:
                loss = losses.dummy_ctc_loss(logits)
        return {"loss": loss, "logits": logits}


class Wav2Vec2ForSequenceClassification(nn.Module):
    config: Wav2Vec2Config

    def setup(self):
        cfg = self.config
        self.wav2vec2 = Wav2Vec2Model(cfg)
        self.projector = nn.Dense(cfg.classifier_proj_size, dtype=cfg.dtype,
                                  kernel_init=DenseInit)
        self.dropout = nn.Dropout(cfg.hidden_dropout)
        self.classifier = nn.Dense(cfg.num_labels, dtype=cfg.dtype,
                                   kernel_init=DenseInit)

    def __call__(self, inputs, attention_mask=None, labels=None,
                 training: bool = False, deterministic=None) -> Dict[str, Any]:
        deterministic = (not training) if deterministic is None else deterministic
        outputs = self.wav2vec2(
            inputs, attention_mask=attention_mask, training=training,
            deterministic=deterministic,
        )
        hidden = outputs["last_hidden_state"]
        if attention_mask is not None:
            m = attention_mask[:, :, None].astype(hidden.dtype)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.sum(m, axis=1)
        else:
            pooled = jnp.mean(hidden, axis=1)
        pooled = jnp.tanh(self.projector(pooled))
        pooled = self.dropout(pooled, deterministic=deterministic)
        logits = self.classifier(pooled)

        loss = None
        if training and labels is not None:
            loss = losses.classification_loss(logits, labels)
        return {"loss": loss, "logits": logits}


def stack_layer_params(params):
    """Convert an unrolled encoder param tree (`layers_0`..`layers_{L-1}`)
    to the scan layout (`layers` with [L, ...]-stacked leaves).  Works on any
    subtree containing a wav2vec2 `encoder` dict; other entries untouched."""
    return _map_encoder(params, _stack_encoder)


def unstack_layer_params(params):
    """Inverse of `stack_layer_params`."""
    return _map_encoder(params, _unstack_encoder)


def _map_encoder(tree, fn):
    if not isinstance(tree, dict):
        return tree
    out = {}
    for key, value in tree.items():
        if key == "encoder" and isinstance(value, dict) and any(
            k == "layers" or k.startswith("layers_") for k in value
        ):
            out[key] = fn(value)
        else:
            out[key] = _map_encoder(value, fn)
    return out


def _stack_encoder(encoder):
    layer_keys = sorted(
        (k for k in encoder if k.startswith("layers_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if not layer_keys:
        return encoder
    out = {k: v for k, v in encoder.items() if not k.startswith("layers_")}
    out["layers"] = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *(encoder[k] for k in layer_keys),
    )
    return out


def _unstack_encoder(encoder):
    if "layers" not in encoder:
        return encoder
    out = {k: v for k, v in encoder.items() if k != "layers"}
    stacked = encoder["layers"]
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(num_layers):
        out[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda leaf, i=i: leaf[i], stacked)
    return out


def create_full_model(
    model_type: str = "pretraining",
    model_size: str = "small",
    num_negatives: int = 100,
    mask_time_prob: float = 0.065,
    mask_time_length: int = 10,
    real_ctc: bool = False,
    **overrides,
):
    """Factory matching reference create_full_model
    (speech_jobs/wav2vec2_dist.py:1157-1182)."""
    config = Wav2Vec2Config.from_size(
        model_size,
        num_negatives=num_negatives,
        mask_time_prob=mask_time_prob,
        mask_time_length=mask_time_length,
        **overrides,
    )
    if model_type == "pretraining":
        return Wav2Vec2ForPreTraining(config), config
    if model_type == "asr":
        return Wav2Vec2ForCTC(config, real_ctc=real_ctc), config
    if model_type == "classification":
        return Wav2Vec2ForSequenceClassification(config), config
    return Wav2Vec2Model(config), config
