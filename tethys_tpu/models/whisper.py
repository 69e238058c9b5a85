"""Whisper encoder-decoder ASR model as pure flax.linen modules.

Capability-parity rebuild of the reference Keras implementation
(reference speech_jobs/whisper_dist.py:10-733) designed TPU-first:

* static shapes everywhere (XLA traces once; the causal bias and sinusoidal
  tables fold into compile-time constants),
* softmax and loss in float32, matmuls in `config.compute_dtype` (bfloat16 on
  the MXU for throughput runs),
* greedy generation is a `lax.while_loop` with a real KV-cache — the
  reference computes a cache but re-feeds the full prefix every step
  (reference speech_jobs/whisper_dist.py:636-709, see SURVEY §3.4); we keep
  its *observable* semantics (same tokens, same early-stop rule) while doing
  O(T) work per step.

Architecture parity notes (vs reference lines):
* q is pre-scaled by head_dim^-0.5 (whisper_dist.py:87,141).
* All attention projections carry biases, including k_proj (whisper_dist.py:88
  — upstream Whisper omits the k bias; the reference does not).
* Pre-LN residual blocks; encoder final LayerNorm (whisper_dist.py:210-236).
* conv1 k=3 s=1 SAME, conv2 k=3 s=2 SAME, exact-erf GELU (whisper_dist.py:305-372).
* Decoder inputs = labels right-shifted with decoder_start_token_id
  (whisper_dist.py:557-563); loss = shifted sparse CE, padding-masked mean
  when a decoder mask is given (whisper_dist.py:583-600).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tethys_tpu.configs import WhisperConfig
from tethys_tpu.losses import seq2seq_shifted_ce
from tethys_tpu.ops.activations import gelu
from tethys_tpu.ops.attention import (
    decode_attention,
    flash_active,
    multi_head_attention,
)
from tethys_tpu.ops.pallas_dropout import module_dropout
from tethys_tpu.ops.pallas_qkv import merge_project, project_split
from tethys_tpu.ops.masks import NEG_INF, causal_additive_mask
from tethys_tpu.ops.sharding import seq_constrain
from tethys_tpu.ops.posenc import sinusoidal_table

DenseInit = nn.initializers.glorot_uniform()
EmbedInit = lambda key, shape, dtype=jnp.float32: jax.random.uniform(  # noqa: E731
    key, shape, dtype, -0.05, 0.05
)

# KV cache pytree: {"k": [B,H,D,max], "v": [B,H,D,max]} per self-attn
# layer (transposed — max_length minor — so decode streams full-lane rows).
Cache = Dict[str, jax.Array]


class _ProjParams(nn.Module):
    """Declares a Dense-shaped (kernel, bias) pair WITHOUT computing, so the
    attention can feed the fused projection kernels (ops/pallas_qkv.py).
    Param tree paths/shapes/inits are byte-identical to the nn.Dense modules
    this replaced (name/kernel, name/bias) — checkpoints, the TF parity
    port, and the TP sharding rules all keep working.  The accessor is NOT
    `__call__` so flax capture_intermediates doesn't census raw weights as
    activations (the q/k/v/out activations are instead in the analytic
    intra-op census, profiling/tensorsize.py)."""

    features: int

    @nn.compact
    def fetch(self, in_features: int):
        kernel = self.param("kernel", DenseInit, (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class WhisperAttention(nn.Module):
    """Unified self / cross / cached attention.

    Projections route through project_split/merge_project
    (ops/pallas_qkv.py): by default the identical-numerics dot +
    split_heads path; TETHYS_FUSED_QKV=1 opts into the fused
    projection+head-split / merge+projection pallas kernels, which the
    v5e whole-step A/B measured ~4 ms SLOWER at base shapes (recorded
    negative, BASELINE.md round 4)."""

    config: WhisperConfig
    num_heads: int

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,                 # [B, Tq, E] query source
        key_value_states: Optional[jax.Array] = None,  # [B, Tk, E] for cross-attn
        bias: Optional[jax.Array] = None,         # additive attention bias
        cache: Optional[Cache] = None,            # self-attn KV cache buffers
        cache_index: Optional[jax.Array] = None,  # scalar write position
        deterministic: bool = True,
        kv_len: Optional[int] = None,  # true KV length when inputs are padded
        precomputed_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        kv_only: bool = False,  # return split (K, V) of kv_source, no attention
    ) -> Tuple[jax.Array, Optional[Cache]]:
        cfg = self.config
        d_model = cfg.d_model
        head_dim = d_model // self.num_heads
        dtype = cfg.dtype

        proj = lambda name: _ProjParams(  # noqa: E731
            d_model, name=name).fetch(d_model)
        q_w, k_w, v_w, out_w = (
            proj("q_proj"), proj("k_proj"), proj("v_proj"), proj("out_proj")
        )

        def cast(x):
            return x.astype(dtype)

        kv_source = key_value_states if key_value_states is not None else hidden_states
        if kv_only:
            # Incremental-decode setup: project K/V once per generate() so
            # the per-token decode step skips 2 projections of the full
            # [B, Tenc, E] encoder output per layer.  Stored TRANSPOSED
            # ([B, H, D, Tk]): with Tk minor the cache rows are full
            # 128-lane tiles, halving the bytes every decode step streams
            # (head_dim 64 would otherwise pad to 128 lanes — the decode
            # bottleneck, BASELINE.md round-4 profile).
            k, v = project_split(
                cast(kv_source), [(*k_w, 1.0), (*v_w, 1.0)], self.num_heads)
            k_t, v_t = jnp.swapaxes(k, 2, 3), jnp.swapaxes(v, 2, 3)
            if cfg.kv_quant == "int8":
                # Serving extension: int8 cache + per-column f32 scales
                # halves the dominant decode HBM stream (pallas_decode.py).
                from tethys_tpu.ops.pallas_decode import quantize_kv_cols

                k8, sk = quantize_kv_cols(k_t)
                v8, sv = quantize_kv_cols(v_t)
                return (k8, sk, v8, sv), None
            return (k_t, v_t), None

        scaling = head_dim ** -0.5
        is_self_attn = key_value_states is None and precomputed_kv is None

        if is_self_attn:
            query, key, value = project_split(
                cast(hidden_states),
                [(*q_w, scaling), (*k_w, 1.0), (*v_w, 1.0)], self.num_heads)
        else:
            (query,) = project_split(
                cast(hidden_states), [(*q_w, scaling)], self.num_heads)
            if precomputed_kv is not None:
                # Serving decode step: attend against the transposed
                # per-generate caches (deterministic, no self-KV cache).
                if len(precomputed_kv) == 4:  # int8 cache: (k8, sk, v8, sv)
                    if bias is not None:
                        raise ValueError(
                            "int8 cross-KV decode carries no attention bias")
                    from tethys_tpu.ops.pallas_decode import (
                        decode_cross_attention_q8,
                    )

                    attn = decode_cross_attention_q8(
                        query, *precomputed_kv, kv_len=kv_len)
                else:
                    attn = decode_attention(
                        query, *precomputed_kv, bias=bias, kv_len=kv_len)
                return merge_project(attn.astype(dtype), *out_w), None
            key, value = project_split(
                cast(kv_source), [(*k_w, 1.0), (*v_w, 1.0)],
                self.num_heads)

        new_cache = None
        if cache is not None:
            # Incremental decode: write current K/V at cache_index, attend to
            # the full buffer with positions > index masked out.  The caches
            # are stored TRANSPOSED ([B, H, D, T_max], full-lane rows — same
            # rationale as the cross caches above); the current token lands
            # as a column write at cache_index.
            if bias is None and query.shape[2] == 1:
                # The standard decode step: one fused pallas kernel appends
                # the column IN PLACE and attends from the same VMEM-resident
                # slabs — the unfused column DUS below is a read-modify-write
                # of the whole buffer (T_max minor puts the column in every
                # vreg), i.e. 3x the cache bytes per token vs the kernel's 2x
                # (ops/pallas_decode.py; falls back to this exact composition
                # off-TPU).
                from tethys_tpu.ops.pallas_decode import decode_self_attention

                attn, k_buf, v_buf = decode_self_attention(
                    query, key, value, cache["k"], cache["v"], cache_index)
                return (merge_project(attn.astype(dtype), *out_w),
                        {"k": k_buf, "v": v_buf})
            k_buf = jax.lax.dynamic_update_slice(
                cache["k"], jnp.swapaxes(key, 2, 3).astype(cache["k"].dtype),
                (0, 0, 0, cache_index)
            )
            v_buf = jax.lax.dynamic_update_slice(
                cache["v"], jnp.swapaxes(value, 2, 3).astype(cache["v"].dtype),
                (0, 0, 0, cache_index)
            )
            new_cache = {"k": k_buf, "v": v_buf}
            max_len = k_buf.shape[3]
            positions = jnp.arange(max_len)
            valid = positions <= cache_index  # current token included
            pos_bias = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :]
            bias = pos_bias if bias is None else bias + pos_bias
            attn = decode_attention(query, k_buf, v_buf, bias=bias)
            return merge_project(attn.astype(dtype), *out_w), new_cache

        dropout_rng = None
        if not deterministic and cfg.attention_dropout > 0.0:
            dropout_rng = self.make_rng("dropout")

        attn = multi_head_attention(
            query, key, value,
            bias=bias,
            dropout_rate=cfg.attention_dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            use_flash=cfg.use_flash_attention,
            kv_len=kv_len,
        )
        # [B, H, Tq, d] × out_proj -> [B, Tq, E]; merge fused into the matmul
        return merge_project(attn.astype(dtype), *out_w), new_cache


class WhisperFeedForward(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        x = nn.Dense(cfg.d_ff, dtype=cfg.dtype, kernel_init=DenseInit, name="fc1")(x)
        x = gelu(x)
        x = module_dropout(self, x, cfg.activation_dropout, deterministic)
        x = nn.Dense(cfg.d_model, dtype=cfg.dtype, kernel_init=DenseInit, name="fc2")(x)
        x = module_dropout(self, x, cfg.dropout, deterministic)
        return x


def _remat_policy(cfg: WhisperConfig):
    """Checkpoint policy for config.remat_layers (see configs.remat_policy)."""
    if cfg.remat_policy == "save_flash":
        from jax.ad_checkpoint import checkpoint_policies

        return checkpoint_policies.save_only_these_names(
            "flash_o", "flash_lse")
    if cfg.remat_policy == "none":
        return None
    raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r}")


class WhisperEncoderLayer(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, x: jax.Array, bias=None, deterministic: bool = True,
                 kv_len: Optional[int] = None):
        cfg = self.config
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="self_attn_layer_norm")(x)
        attn_out, _ = WhisperAttention(
            cfg, cfg.encoder_attention_heads, name="self_attn"
        )(x, bias=bias, deterministic=deterministic, kv_len=kv_len)
        x = residual + attn_out

        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="final_layer_norm")(x)
        x = residual + WhisperFeedForward(cfg, name="feed_forward")(
            x, deterministic=deterministic
        )
        return x


class WhisperDecoderLayer(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_hidden_states: jax.Array,
        self_attn_bias=None,
        cross_attn_bias=None,
        cache: Optional[Cache] = None,
        cache_index=None,
        deterministic: bool = True,
        cross_kv_len: Optional[int] = None,
        cross_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        cross_kv_only: bool = False,
    ):
        cfg = self.config
        if cross_kv_only:
            # Project this layer's cross-attention K/V from the encoder
            # output (generate()-time setup; see WhisperAttention.kv_only).
            return WhisperAttention(
                cfg, cfg.decoder_attention_heads, name="encoder_attn"
            )(encoder_hidden_states, key_value_states=encoder_hidden_states,
              kv_only=True)
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="self_attn_layer_norm")(x)
        attn_out, new_cache = WhisperAttention(
            cfg, cfg.decoder_attention_heads, name="self_attn"
        )(x, bias=self_attn_bias, cache=cache, cache_index=cache_index,
          deterministic=deterministic)
        x = residual + attn_out

        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="encoder_attn_layer_norm")(x)
        cross_out, _ = WhisperAttention(
            cfg, cfg.decoder_attention_heads, name="encoder_attn"
        )(x, key_value_states=encoder_hidden_states, bias=cross_attn_bias,
          deterministic=deterministic, kv_len=cross_kv_len,
          precomputed_kv=cross_kv)
        x = residual + cross_out

        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="final_layer_norm")(x)
        x = residual + WhisperFeedForward(cfg, name="feed_forward")(
            x, deterministic=deterministic
        )
        return x, new_cache


class WhisperEncoder(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, input_features: jax.Array, deterministic: bool = True,
                 keep_padded: bool = False):
        """input_features: [B, n_mels, T] log-mel frames (reference layout).

        On the flash-attention path the sequence is zero-padded ONCE here to
        the kernel's block multiple (e.g. 1500 -> 1536) instead of padding
        q/k/v at every pallas call (3 copies x layers x fwd/bwd in round 1);
        padded key positions are masked via `kv_len`, and padded rows are
        sliced off at the end (or kept for the decoder's cross-attention when
        `keep_padded=True`, where the same masking applies).
        """
        cfg = self.config
        x = input_features.transpose(0, 2, 1).astype(cfg.dtype)  # [B, T, n_mels]
        x = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(1,), padding="SAME",
                    dtype=cfg.dtype, kernel_init=DenseInit, name="conv1")(x)
        x = gelu(x)
        x = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(2,), padding="SAME",
                    dtype=cfg.dtype, kernel_init=DenseInit, name="conv2")(x)
        x = gelu(x)

        pe = jnp.asarray(sinusoidal_table(cfg.n_ctx, cfg.d_model))
        x = x + pe[None, : x.shape[1], :].astype(cfg.dtype)
        x = module_dropout(self, x, cfg.dropout, deterministic)

        true_len = x.shape[1]
        pad_len = true_len
        if flash_active(cfg.use_flash_attention, true_len, true_len):
            from tethys_tpu.ops.pallas_attention import padded_seq_len

            pad_len = padded_seq_len(true_len)
            if pad_len != true_len:
                x = jnp.pad(x, ((0, 0), (0, pad_len - true_len), (0, 0)))
        kv_len = true_len if pad_len != true_len else None

        # Sequence-parallel hook (no-op unless a trainer installed
        # ops.sharding.seq_axis_rules): constrain [B, T, D] at layer
        # boundaries so GSPMD keeps the time axis sharded through LN/FFN
        # and gathers K/V for attention.
        x = seq_constrain(x)
        layer_cls = WhisperEncoderLayer
        if cfg.remat_layers:
            # Per-layer activation checkpointing (see configs.remat_layers).
            # static argnums count the module as 0: (x=1, bias=2,
            # deterministic=3, kv_len=4).
            layer_cls = nn.remat(WhisperEncoderLayer, static_argnums=(3, 4),
                                 policy=_remat_policy(cfg))
        for i in range(cfg.encoder_layers):
            x = layer_cls(cfg, name=f"layers_{i}")(
                x, None, deterministic, kv_len
            )
            x = seq_constrain(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        if pad_len != true_len and not keep_padded:
            x = x[:, :true_len]
        return x


class WhisperDecoder(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,               # [B, T]
        encoder_hidden_states: jax.Array,   # [B, Tenc, E] (maybe padded)
        caches: Optional[Tuple[Cache, ...]] = None,
        cache_index=None,
        deterministic: bool = True,
        cross_kv_len: Optional[int] = None,  # true encoder length when padded
        cross_kvs=None,            # per-layer precomputed cross (K, V)
        cross_kv_only: bool = False,
    ):
        cfg = self.config
        if cross_kv_only:
            # generate()-time setup pass: per-layer cross-attention K/V.
            return tuple(
                WhisperDecoderLayer(cfg, name=f"layers_{i}")(
                    None, encoder_hidden_states, cross_kv_only=True
                )[0]
                for i in range(cfg.decoder_layers)
            )
        embed = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                         embedding_init=EmbedInit, name="embed_tokens")
        x = embed(input_ids)

        pe = jnp.asarray(sinusoidal_table(cfg.max_target_positions, cfg.d_model))
        if cache_index is None:
            x = x + pe[None, : x.shape[1], :].astype(cfg.dtype)
            self_bias = causal_additive_mask(x.shape[1], dtype=jnp.float32)
        else:
            pos = jax.lax.dynamic_slice_in_dim(pe, cache_index, x.shape[1], axis=0)
            x = x + pos[None].astype(cfg.dtype)
            self_bias = None  # the cache path masks future positions itself
        x = module_dropout(self, x, cfg.dropout, deterministic)

        new_caches = []
        layer_cls = WhisperDecoderLayer
        if cfg.remat_layers and caches is None:
            # Training path only (the cached decode path re-traces per token
            # and gains nothing from remat).  static argnums with the module
            # as 0: deterministic=7, cross_kv_len=8, cross_kv_only=10.
            layer_cls = nn.remat(WhisperDecoderLayer,
                                 static_argnums=(7, 8, 10),
                                 policy=_remat_policy(cfg))
        for i in range(cfg.decoder_layers):
            layer_cache = caches[i] if caches is not None else None
            x, new_cache = layer_cls(cfg, name=f"layers_{i}")(
                x,
                encoder_hidden_states,
                self_bias,
                None,  # cross_attn_bias
                layer_cache,
                cache_index,
                deterministic,
                cross_kv_len,
                cross_kvs[i] if cross_kvs is not None else None,
                False,  # cross_kv_only
            )
            new_caches.append(new_cache)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        if caches is not None:
            return x, tuple(new_caches)
        return x


class WhisperModel(nn.Module):
    config: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.config)
        self.decoder = WhisperDecoder(self.config)

    def __call__(
        self,
        input_features: Optional[jax.Array],
        decoder_input_ids: Optional[jax.Array] = None,
        encoder_outputs: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        cross_kv_len = None
        if encoder_outputs is None:
            # Keep the encoder's flash padding for cross-attention (masked
            # via cross_kv_len); the returned tensor is sliced back so the
            # public contract is unchanged (and the slice is dead code under
            # grad when only the loss is consumed).
            enc_true_len = -(-input_features.shape[-1] // 2)  # conv2 stride 2
            encoder_outputs = self.encoder(
                input_features, deterministic=deterministic, keep_padded=True
            )
            if encoder_outputs.shape[1] != enc_true_len:
                cross_kv_len = enc_true_len
        if decoder_input_ids is None:
            batch = encoder_outputs.shape[0]
            decoder_input_ids = jnp.full(
                (batch, 1), self.config.decoder_start_token_id, dtype=jnp.int32
            )
        hidden = self.decoder(
            decoder_input_ids, encoder_outputs, deterministic=deterministic,
            cross_kv_len=cross_kv_len,
        )
        return {
            "last_hidden_state": hidden,
            "encoder_last_hidden_state": (
                encoder_outputs[:, :cross_kv_len]
                if cross_kv_len is not None else encoder_outputs
            ),
        }


class WhisperForConditionalGeneration(nn.Module):
    config: WhisperConfig

    def setup(self):
        self.model = WhisperModel(self.config)
        self.lm_head = nn.Dense(
            self.config.vocab_size, use_bias=False, dtype=self.config.dtype,
            kernel_init=DenseInit,
        )

    def __call__(
        self,
        input_features: Optional[jax.Array],
        decoder_input_ids: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
        encoder_outputs: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        if decoder_input_ids is None and labels is not None:
            # Teacher forcing: right-shift labels, prepend start token.
            decoder_input_ids = jnp.concatenate(
                [
                    jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id,
                             dtype=labels.dtype),
                    labels[:, :-1],
                ],
                axis=1,
            )
        outputs = self.model(
            input_features,
            decoder_input_ids=decoder_input_ids,
            encoder_outputs=encoder_outputs,
            deterministic=deterministic,
        )
        lm_logits = self.lm_head(outputs["last_hidden_state"])

        loss = None
        if labels is not None:
            loss = seq2seq_shifted_ce(
                lm_logits, labels, decoder_attention_mask=decoder_attention_mask
            )
        return {
            "loss": loss,
            "logits": lm_logits,
            "encoder_last_hidden_state": outputs["encoder_last_hidden_state"],
        }

    # --- generation helpers (used by greedy_generate below) ---

    def prepare_inputs_for_generation(self, decoder_input_ids,
                                      past_key_values=None,
                                      attention_mask=None, use_cache=None,
                                      encoder_outputs=None, **kwargs):
        """Decode-step input builder, API parity with the reference helper
        (speech_jobs/whisper_dist.py:618-634 — defined there but never called,
        SURVEY quirk #5; here greedy_generate's cached loop embodies the same
        last-token-only policy)."""
        if past_key_values is not None:
            decoder_input_ids = decoder_input_ids[:, -1:]
        return {
            "decoder_input_ids": decoder_input_ids,
            "past_key_values": past_key_values,
            "encoder_outputs": encoder_outputs,
            "attention_mask": attention_mask,
            "use_cache": use_cache,
        }

    def encode(self, input_features: jax.Array) -> jax.Array:
        return self.model.encoder(input_features, deterministic=True)

    def precompute_cross_kv(self, encoder_hidden_states: jax.Array):
        """Per-layer cross-attention (K, V) projected once per generate():
        the per-token decode step then skips 2 full-length encoder-output
        projections per layer (12 matmuls/token at whisper-base).  Returned
        TRANSPOSED ([B, H, D, Tk] per layer) so decode streams full-lane
        cache rows — see WhisperAttention.kv_only / decode_cross_attention."""
        return self.model.decoder(
            None, encoder_hidden_states, cross_kv_only=True)

    def decode_step(
        self,
        token: jax.Array,                 # [B, 1]
        encoder_hidden_states: jax.Array,
        caches: Tuple[Cache, ...],
        cache_index: jax.Array,
        cross_kvs=None,
    ):
        hidden, new_caches = self.model.decoder(
            token, encoder_hidden_states,
            caches=caches, cache_index=cache_index, deterministic=True,
            cross_kvs=cross_kvs,
        )
        logits = self.lm_head(hidden)
        return logits, new_caches


def create_whisper_model(model_type: str = "small", **overrides):
    """Factory matching reference create_whisper_model
    (speech_jobs/whisper_dist.py:852-890)."""
    config = WhisperConfig.from_size(model_type, **overrides)
    return WhisperForConditionalGeneration(config), config


def init_kv_caches(config: WhisperConfig, batch: int, max_length: int):
    """Self-attention KV buffers, stored TRANSPOSED ([B, H, D, T_max]) so
    the per-token decode step streams full-lane cache rows (see
    decode_attention)."""
    head_dim = config.d_model // config.decoder_attention_heads
    shape = (batch, config.decoder_attention_heads, head_dim, max_length)
    zeros = jnp.zeros(shape, dtype=config.dtype)
    return tuple(
        {"k": zeros, "v": zeros} for _ in range(config.decoder_layers)
    )


def _decode_scan_body(model, variables, encoder_hidden, cross_kvs, cfg):
    """One greedy decode step as a lax.scan body over the token index —
    shared by greedy_generate's in-graph forms and make_chunked_greedy's
    host-chunked form (identical numerics by construction)."""

    def body(carry, i):
        tokens, caches, done, n = carry
        current = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
        logits, caches = model.apply(
            variables, current, encoder_hidden, caches, i, cross_kvs,
            method=model.decode_step,
        )
        next_tokens = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        next_tokens = jnp.where(done, cfg.pad_token_id, next_tokens)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, next_tokens[:, None], i + 1, axis=1
        )
        n = jnp.where(done, n, i + 1)
        done = jnp.logical_or(done, jnp.all(next_tokens == cfg.eos_token_id))
        return (tokens, caches, done, n), None

    return body


def greedy_generate(
    model: WhisperForConditionalGeneration,
    variables,
    input_features: jax.Array,
    max_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    early_stop_chunk: Optional[int] = None,
) -> jax.Array:
    """Greedy decoding with KV cache, jit-compatible.

    Observable semantics match the reference generate()
    (speech_jobs/whisper_dist.py:636-709): start from decoder_start_token_id,
    pick argmax each step (the reference's temperature/top-k transforms never
    change an argmax, so greedy is exact), stop early only when *all* current
    tokens are EOS at the same step, and keep extending finished sequences
    otherwise.  Unlike the reference, the KV cache is actually reused.
    """
    cfg = model.config
    max_length = max_length or cfg.max_target_positions
    del temperature, top_k  # argmax-invariant; kept for API parity
    batch = input_features.shape[0]

    chunk = early_stop_chunk
    if chunk is not None:
        # A non-dividing chunk would overrun max_length in the no-EOS case:
        # whole chunks always run to completion, so the final one would
        # execute up to chunk-1 extra decode steps past max_length —
        # indexing the positional table beyond max_target_positions when
        # max_length == max_target_positions, and doing MORE work than the
        # plain scan the option exists to beat.  Require an exact fit.
        if max_length % chunk != 0:
            raise ValueError(
                f"early_stop_chunk={chunk} must divide max_length="
                f"{max_length}")
        n_chunks = max_length // chunk
    buf_len = max_length

    encoder_hidden = model.apply(variables, input_features, method=model.encode)
    cross_kvs = model.apply(variables, encoder_hidden,
                            method=model.precompute_cross_kv)
    caches = init_kv_caches(cfg, batch, buf_len)

    tokens = jnp.full((batch, buf_len + 1), cfg.pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)

    # lax.scan over the fixed max_length, not lax.while_loop: the while
    # form compiled pathologically slowly (>50 min) on the tunneled TPU
    # toolchain.  `done` reproduces the early-stop SEMANTICS exactly — once
    # every token is EOS, later slots receive pad (the while version left
    # their initial pad fill untouched) and `n` freezes at the stop step —
    # the scan merely keeps executing masked steps, trading wasted FLOPs
    # after a global stop for a compilable program.
    #
    # `early_stop_chunk=C` (opt-in) bounds that waste: a lax.while_loop over
    # chunks, each chunk a C-step scan — at most C-1 wasted steps after a
    # global EOS instead of max_length-i.  Output-identical to the plain
    # scan (test-pinned).  NOTE: on the round-3 remote-compile TPU
    # toolchain even this chunked while form did not compile within 25 min
    # (whisper-base, C=32, len 128 — BASELINE.md), so it stays opt-in for
    # toolchains without the while_loop pathology.
    body = _decode_scan_body(model, variables, encoder_hidden, cross_kvs, cfg)

    init = (tokens, caches, jnp.bool_(False), jnp.int32(0))
    if chunk is None:
        (tokens, _, _, length), _ = jax.lax.scan(
            body, init, jnp.arange(max_length))
        return tokens, length + 1

    def cond_fn(carry):
        (_, _, done, _), c = carry
        return jnp.logical_and(jnp.logical_not(done), c < n_chunks)

    def while_body(carry):
        inner, c = carry
        inner, _ = jax.lax.scan(body, inner, c * chunk + jnp.arange(chunk))
        return inner, c + 1

    (tokens, _, _, length), _ = jax.lax.while_loop(
        cond_fn, while_body, (init, jnp.int32(0)))
    tokens = tokens[:, : max_length + 1]
    length = jnp.minimum(length + 1, max_length + 1)
    return tokens, length


def make_chunked_greedy(
    model: WhisperForConditionalGeneration,
    max_length: int,
    chunk: int,
):
    """Early-stopping greedy decode as a HOST loop of one jitted C-step
    chunk (VERDICT r3 item 9).

    The in-graph early-stop forms both lose on this toolchain: the plain
    scan always runs max_length steps, and the while-of-scans form does
    not compile within 25 min through the remote-compile service
    (greedy_generate's early_stop_chunk note above).  Here each chunk is
    the SAME C-step scan compiled once (the chunk start index is a traced
    argument, so every chunk reuses one executable); after each chunk the
    host fetches the scalar `done` flag (~1 RTT, amortized over C decode
    steps) and stops dispatching.  Token-identical to greedy_generate
    (shared _decode_scan_body; test-pinned); at most C-1 decode steps are
    wasted after a global EOS instead of max_length - n.

    Returns `generate(variables, input_features) -> (tokens, length)`;
    after each call `generate.chunks_run` holds the number of chunks
    dispatched (observability for tests/benches)."""
    if max_length % chunk != 0:
        raise ValueError(f"chunk={chunk} must divide max_length={max_length}")
    cfg = model.config
    n_chunks = max_length // chunk

    @jax.jit
    def prelude(variables, input_features):
        encoder_hidden = model.apply(variables, input_features,
                                     method=model.encode)
        cross_kvs = model.apply(variables, encoder_hidden,
                                method=model.precompute_cross_kv)
        return encoder_hidden, cross_kvs

    @jax.jit
    def run_chunk(variables, encoder_hidden, cross_kvs, carry, start):
        body = _decode_scan_body(model, variables, encoder_hidden,
                                 cross_kvs, cfg)
        carry, _ = jax.lax.scan(body, carry, start + jnp.arange(chunk))
        return carry

    def generate(variables, input_features):
        batch = input_features.shape[0]
        encoder_hidden, cross_kvs = prelude(variables, input_features)
        caches = init_kv_caches(cfg, batch, max_length)
        tokens = jnp.full((batch, max_length + 1), cfg.pad_token_id,
                          dtype=jnp.int32)
        tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
        carry = (tokens, caches, jnp.bool_(False), jnp.int32(0))
        for c in range(n_chunks):
            carry = run_chunk(variables, encoder_hidden, cross_kvs, carry,
                              jnp.int32(c * chunk))
            generate.chunks_run = c + 1
            # Host fetch of the scalar done flag — the early stop itself.
            if bool(jax.device_get(carry[2])):
                break
        tokens, _, _, length = carry
        return tokens, length + 1

    generate.chunks_run = 0
    return generate
