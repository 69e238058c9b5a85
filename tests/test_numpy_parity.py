"""Whole-model numerical parity vs an independent numpy forward pass.

The TF reference cannot run its GPU jobs here, so full-model parity is
checked against a from-scratch numpy implementation of the same architecture
(written against the SURVEY.md spec, sharing nothing with the flax code but
the extracted weights).  Catches wiring mistakes (pre/post-LN order, residual
placement, head reshapes, quantizer plumbing) that per-op goldens cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from tethys_tpu.configs import WhisperConfig, Wav2Vec2Config
from tethys_tpu.models.whisper import WhisperForConditionalGeneration
from tethys_tpu.models.wav2vec2 import Wav2Vec2ForPreTraining


def np_gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_layernorm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_dense(x, p):
    out = x @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    return out


def np_conv1d_same(x, kernel, stride=1, bias=None, groups=1):
    """[B, T, Cin] with TF SAME padding; kernel [K, Cin/groups, Cout]."""
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    out_t = -(-t // stride)
    pad_total = max((out_t - 1) * stride + k - t, 0)
    lo = pad_total // 2
    xp = np.pad(x, ((0, 0), (lo, pad_total - lo), (0, 0)))
    out = np.zeros((b, out_t, cout), dtype=np.float64)
    gin = cin // groups
    gout = cout // groups
    for g in range(groups):
        xg = xp[:, :, g * gin:(g + 1) * gin]
        kg = kernel[:, :, g * gout:(g + 1) * gout]
        for ti in range(out_t):
            window = xg[:, ti * stride: ti * stride + k, :]
            out[:, ti, g * gout:(g + 1) * gout] = np.einsum(
                "bkc,kcd->bd", window, kg)
    if bias is not None:
        out = out + bias
    return out


def np_mha(x, p, num_heads, kv=None, causal=False):
    d = x.shape[-1]
    head = d // num_heads
    q = np_dense(x, p["q_proj"]) * head ** -0.5
    src = x if kv is None else kv
    k = np_dense(src, p["k_proj"])
    v = np_dense(src, p["v_proj"])

    def split(t):
        b, s, _ = t.shape
        return t.reshape(b, s, num_heads, head).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(0, 1, 3, 2)
    if causal:
        tq = scores.shape[-2]
        mask = np.triu(np.ones((tq, tq)), 1) * -1e9
        scores = scores + mask
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ctx = probs @ v
    b, h, s, hd = ctx.shape
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    return np_dense(ctx, p["out_proj"])


def np_sinusoid(max_len, d):
    pe = np.zeros((max_len, d))
    pos = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def test_whisper_forward_parity():
    cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4, d_ff=64,
        n_mels=8, n_ctx=32, vocab_size=50, max_target_positions=16,
        decoder_start_token_id=47,
    )
    model = WhisperForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(3)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 64)),
        dtype=jnp.float32)
    labels = jnp.asarray(
        np.random.default_rng(1).integers(3, 40, (2, 10)), dtype=jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, feats, labels=labels,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, feats, labels=labels,
                      deterministic=True)

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float64),
                               params)
    f = np.asarray(feats, dtype=np.float64)

    # --- encoder ---
    enc = p["model"]["encoder"]
    x = f.transpose(0, 2, 1)
    x = np_gelu(np_conv1d_same(x, enc["conv1"]["kernel"], 1,
                               enc["conv1"]["bias"]))
    x = np_gelu(np_conv1d_same(x, enc["conv2"]["kernel"], 2,
                               enc["conv2"]["bias"]))
    x = x + np_sinusoid(cfg.n_ctx, cfg.d_model)[None, : x.shape[1]]
    for i in range(cfg.encoder_layers):
        lp = enc[f"layers_{i}"]
        h = np_layernorm(x, lp["self_attn_layer_norm"]["scale"],
                         lp["self_attn_layer_norm"]["bias"])
        x = x + np_mha(h, lp["self_attn"], cfg.encoder_attention_heads)
        h = np_layernorm(x, lp["final_layer_norm"]["scale"],
                         lp["final_layer_norm"]["bias"])
        h = np_dense(np_gelu(np_dense(h, lp["feed_forward"]["fc1"])),
                     lp["feed_forward"]["fc2"])
        x = x + h
    enc_out = np_layernorm(x, enc["layer_norm"]["scale"],
                           enc["layer_norm"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out["encoder_last_hidden_state"]), enc_out,
        rtol=1e-4, atol=1e-4)

    # --- decoder (teacher forcing) ---
    dec = p["model"]["decoder"]
    lab = np.asarray(labels)
    dec_ids = np.concatenate(
        [np.full((2, 1), cfg.decoder_start_token_id), lab[:, :-1]], axis=1)
    y = dec["embed_tokens"]["embedding"][dec_ids]
    y = y + np_sinusoid(cfg.max_target_positions, cfg.d_model)[None, :y.shape[1]]
    for i in range(cfg.decoder_layers):
        lp = dec[f"layers_{i}"]
        h = np_layernorm(y, lp["self_attn_layer_norm"]["scale"],
                         lp["self_attn_layer_norm"]["bias"])
        y = y + np_mha(h, lp["self_attn"], cfg.decoder_attention_heads,
                       causal=True)
        h = np_layernorm(y, lp["encoder_attn_layer_norm"]["scale"],
                         lp["encoder_attn_layer_norm"]["bias"])
        y = y + np_mha(h, lp["encoder_attn"], cfg.decoder_attention_heads,
                       kv=enc_out)
        h = np_layernorm(y, lp["final_layer_norm"]["scale"],
                         lp["final_layer_norm"]["bias"])
        h = np_dense(np_gelu(np_dense(h, lp["feed_forward"]["fc1"])),
                     lp["feed_forward"]["fc2"])
        y = y + h
    y = np_layernorm(y, dec["layer_norm"]["scale"], dec["layer_norm"]["bias"])
    logits = y @ p["lm_head"]["kernel"]
    np.testing.assert_allclose(np.asarray(out["logits"]), logits,
                               rtol=1e-3, atol=1e-3)

    # --- loss: shifted CE mean ---
    sl = logits[:, :-1]
    st = lab[:, 1:]
    logz = np.log(np.exp(sl).sum(-1))
    ce = logz - np.take_along_axis(sl, st[..., None], -1)[..., 0]
    np.testing.assert_allclose(float(out["loss"]), ce.mean(), rtol=1e-4)


def test_wav2vec2_forward_parity():
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
        num_codevectors_per_group=12, num_codevector_groups=2,
        codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
    )
    model = Wav2Vec2ForPreTraining(cfg)
    rng = jax.random.PRNGKey(0)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 400)), dtype=jnp.float32)
    params = model.init({"params": rng, "dropout": rng}, audio,
                        training=True)["params"]
    out = model.apply({"params": params}, audio, training=True,
                      deterministic=True)

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float64),
                               params)["wav2vec2"]
    a = np.asarray(audio, dtype=np.float64)[:, :, None]

    # --- feature extractor ---
    fe = p["feature_extractor"]
    x = a
    for i, (kern, stride) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        x = np_conv1d_same(x, fe[f"conv_{i}"]["kernel"], stride)
        # reference GroupNorm: moments over (time, chan-in-group) per group
        b, t, c = x.shape
        g = cfg.num_conv_pos_embedding_groups
        xg = x.reshape(b, t, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        xg = (xg - mean) / np.sqrt(var + 1e-5)
        x = xg.reshape(b, t, c) * fe[f"norm_{i}"]["gamma"] \
            + fe[f"norm_{i}"]["beta"]
        x = np_gelu(x)
    pos = np_conv1d_same(x, fe["pos_conv_embed"]["kernel"], 1,
                         fe["pos_conv_embed"]["bias"],
                         groups=cfg.num_conv_pos_embedding_groups)
    x = x + pos
    x = np_layernorm(x, fe["layer_norm"]["scale"], fe["layer_norm"]["bias"])
    np.testing.assert_allclose(np.asarray(out["extract_features"]), x,
                               rtol=1e-4, atol=1e-4)

    # --- projection + encoder ---
    h = np_dense(x, p["feature_projection"])
    h = np_layernorm(h, p["feature_projection_layer_norm"]["scale"],
                     p["feature_projection_layer_norm"]["bias"])
    projected = h.copy()
    enc = p["encoder"]
    for i in range(cfg.num_hidden_layers):
        lp = enc[f"layers_{i}"]
        n = np_layernorm(h, lp["attention_layer_norm"]["scale"],
                         lp["attention_layer_norm"]["bias"])
        h = h + np_mha(n, lp["attention"], cfg.num_attention_heads)
        n = np_layernorm(h, lp["feed_forward_layer_norm"]["scale"],
                         lp["feed_forward_layer_norm"]["bias"])
        n = np_dense(np_gelu(np_dense(n, lp["feed_forward"]["intermediate_dense"])),
                     lp["feed_forward"]["output_dense"])
        h = h + n
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), h,
                               rtol=1e-4, atol=1e-4)

    # --- quantizer on projected features ---
    q = p["quantizer"]
    proj = np_dense(projected, q["project_to_codevector_dim"])
    groups = cfg.num_codevector_groups
    gdim = cfg.codevector_dim // groups
    b, t, _ = proj.shape
    hg = proj.reshape(b, t, groups, gdim)
    quantized = []
    for g in range(groups):
        code = q["codevectors"][g]
        dist = ((hg[:, :, g, None, :] - code[None, None]) ** 2).sum(-1)
        idx = dist.argmin(-1)
        quantized.append(code[idx])
    quantized = np.concatenate(quantized, axis=-1)
    ph = p["project_q"]
    pq = np_dense(quantized, ph["projection_head"])
    pq = np_layernorm(pq, ph["layer_norm"]["scale"], ph["layer_norm"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out["projected_quantized_features"]), pq,
        rtol=1e-4, atol=1e-4)
