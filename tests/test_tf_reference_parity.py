"""Whole-model numerical parity vs the ACTUAL TF reference classes.

Round-1 verified parity against a from-scratch numpy re-implementation
(tests/test_numpy_parity.py); this harness is the authority upgrade the
build plan promised (SURVEY §7 stage 3): import the reference's own Keras
classes from /root/reference/speech_jobs/*.py, port weights into the flax
models, and assert <1e-3 relative agreement on identical inputs —
per-layer, on logits, and on losses.

Mask-direction finding (quirk #12, discovered by this harness): the
reference decoder's default "causal" mask is INVERTED.  It builds
`mask = 1 - band_part(ones, -1, 0)` (1s strictly above the diagonal,
whisper_dist.py:414-418) and attention applies `(1-mask)*-1e9`
(whisper_dist.py:150-154) — so past+self positions get -1e9 and FUTURE
positions are attended.  Our decoder deviates deliberately and implements
the genuinely causal mask; `test_reference_default_decoder_mask_is_inverted`
pins the reference behavior as evidence, and the parity comparisons inject a
proper causal mask into the reference decoder (its `attention_mask` arg) so
both sides compute the same math.
"""

import importlib.util
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

WHISPER_REF = "/root/reference/speech_jobs/whisper_dist.py"
W2V2_REF = "/root/reference/speech_jobs/wav2vec2_dist.py"


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def _assert_close(a, b, what: str, rtol: float = 1e-3, atol: float = 1e-4):
    """BASELINE north star: <1e-3 relative agreement (atol floors the
    comparison for near-zero activations, where float32 noise dominates)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if not np.allclose(a, b, rtol=rtol, atol=atol):
        worst = np.max(np.abs(a - b) / (np.abs(b) * rtol + atol))
        raise AssertionError(f"{what}: max violation {worst:.3g}x tolerance")


# ---------------------------------------------------------------------------
# Whisper


@pytest.fixture(scope="module")
def ref_whisper():
    return _load(WHISPER_REF, "ref_whisper_dist")


def _tiny_whisper_cfg(ref):
    cfg = ref.WhisperConfig()
    cfg.d_model = 64
    cfg.encoder_layers = 2
    cfg.encoder_attention_heads = 2
    cfg.decoder_layers = 2
    cfg.decoder_attention_heads = 2
    cfg.d_ff = 128
    cfg.n_mels = 16
    cfg.n_ctx = 32            # input mel frames = 64 -> conv2 stride 2 -> 32
    cfg.vocab_size = 97
    cfg.max_target_positions = 24
    cfg.decoder_start_token_id = 90
    # Dropout off so training=True (required by the reference loss branch)
    # is deterministic.
    cfg.dropout = cfg.attention_dropout = cfg.activation_dropout = 0.0
    return cfg


def _dense(layer):
    return {"kernel": layer.kernel.numpy(), "bias": layer.bias.numpy()}


def _ln(layer):
    return {"scale": layer.gamma.numpy(), "bias": layer.beta.numpy()}


def _attn(a):
    return {
        "q_proj": _dense(a.q_proj), "k_proj": _dense(a.k_proj),
        "v_proj": _dense(a.v_proj), "out_proj": _dense(a.out_proj),
    }


def _ffn(f):
    return {"fc1": _dense(f.fc1), "fc2": _dense(f.fc2)}


def port_whisper_weights(ref_model):
    """Structural TF->flax weight port (attribute names match by design)."""
    enc, dec = ref_model.model.encoder, ref_model.model.decoder
    encoder = {
        "conv1": _dense(enc.conv1),
        "conv2": _dense(enc.conv2),
        "layer_norm": _ln(enc.layer_norm),
    }
    for i, layer in enumerate(enc.layers):
        encoder[f"layers_{i}"] = {
            "self_attn": _attn(layer.self_attn),
            "self_attn_layer_norm": _ln(layer.self_attn_layer_norm),
            "feed_forward": _ffn(layer.feed_forward),
            "final_layer_norm": _ln(layer.final_layer_norm),
        }
    decoder = {
        "embed_tokens": {"embedding": dec.embed_tokens.embeddings.numpy()},
        "layer_norm": _ln(dec.layer_norm),
    }
    for i, layer in enumerate(dec.layers):
        decoder[f"layers_{i}"] = {
            "self_attn": _attn(layer.self_attn),
            "self_attn_layer_norm": _ln(layer.self_attn_layer_norm),
            "encoder_attn": _attn(layer.encoder_attn),
            "encoder_attn_layer_norm": _ln(layer.encoder_attn_layer_norm),
            "feed_forward": _ffn(layer.feed_forward),
            "final_layer_norm": _ln(layer.final_layer_norm),
        }
    params = {
        "model": {"encoder": encoder, "decoder": decoder},
        "lm_head": {"kernel": ref_model.lm_head.kernel.numpy()},
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.fixture(scope="module")
def whisper_pair(ref_whisper):
    """(ref tf model, our flax model, ported params, tf cfg, inputs)."""
    from tethys_tpu.models.whisper import create_whisper_model

    cfg = _tiny_whisper_cfg(ref_whisper)
    tf.random.set_seed(0)
    ref_model = ref_whisper.WhisperForConditionalGeneration(cfg)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_ctx),
                                dtype=np.float32)
    labels = rng.integers(3, cfg.vocab_size - 5, size=(2, 12)).astype(np.int32)
    # Build TF weights.
    ref_model(tf.constant(feats), labels=tf.constant(labels), training=True)

    model, _ = create_whisper_model(
        "tiny",
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        d_ff=cfg.d_ff, n_mels=cfg.n_mels, n_ctx=cfg.n_ctx,
        vocab_size=cfg.vocab_size,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        compute_dtype="float32",
    )
    params = port_whisper_weights(ref_model)
    return ref_model, model, params, cfg, feats, labels


def test_whisper_encoder_parity_per_layer(whisper_pair):
    ref_model, model, params, cfg, feats, _ = whisper_pair
    ref_out = ref_model.model.encoder(tf.constant(feats), training=False)

    variables = {"params": params}
    ours, state = model.apply(
        variables, jnp.asarray(feats), method=model.encode, mutable=["intermediates"],
        capture_intermediates=True,
    )
    _assert_close(ours, ref_out["last_hidden_state"].numpy(),
                  "encoder output")

    # Per-layer: reference hidden_states[i] is the INPUT of layer i, so
    # hidden_states[i+1] is the output of layer i.
    inter = state["intermediates"]["model"]["encoder"]
    for i in range(cfg.encoder_layers - 1):
        ours_i = np.asarray(inter[f"layers_{i}"]["__call__"][0])
        ref_i = ref_out["hidden_states"][i + 1].numpy()
        _assert_close(ours_i, ref_i, f"encoder layer {i}")


def test_reference_default_decoder_mask_is_inverted(ref_whisper, whisper_pair):
    """Pins quirk #12: the reference's default decoder mask attends to the
    FUTURE and blocks past+self.  (Evidence for our deliberate deviation.)"""
    ref_model, _, _, cfg, feats, _ = whisper_pair
    enc = ref_model.model.encoder(tf.constant(feats),
                                  training=False)["last_hidden_state"]
    ids = tf.constant(np.arange(8, dtype=np.int32)[None].repeat(2, 0) + 3)

    default = ref_model.model.decoder(ids, enc, training=False)
    causal_keep = tf.linalg.band_part(tf.ones((8, 8)), -1, 0)[None]
    causal = ref_model.model.decoder(ids, enc, attention_mask=causal_keep,
                                     training=False)
    # Default != causal: the built-in mask is not the causal one.
    diff = np.max(np.abs(default["last_hidden_state"].numpy()
                         - causal["last_hidden_state"].numpy()))
    assert diff > 1e-3
    # And the default self-attention probs put ~zero mass on past+self for
    # early queries (row 0 sees only strictly-future keys).
    probs = default["attentions"][0].numpy()  # [B, H, T, T]
    assert probs[0, 0, 0, 0] < 1e-6          # self masked out
    assert probs[0, 0, 0, 1:].sum() > 0.99   # all mass on the future


def test_whisper_decoder_logits_loss_parity(whisper_pair):
    """Decoder + lm_head + shifted-CE loss vs the reference with a proper
    causal mask injected (see module docstring quirk #12)."""
    ref_model, model, params, cfg, feats, labels = whisper_pair

    # Reference pipeline with causal masking.
    enc = ref_model.model.encoder(tf.constant(feats),
                                  training=False)["last_hidden_state"]
    start = np.full((2, 1), cfg.decoder_start_token_id, np.int32)
    dec_ids = np.concatenate([start, labels[:, :-1]], axis=1)
    t = dec_ids.shape[1]
    causal_keep = tf.linalg.band_part(tf.ones((t, t)), -1, 0)[None]
    dec = ref_model.model.decoder(
        tf.constant(dec_ids), enc, attention_mask=causal_keep,
        training=False)["last_hidden_state"]
    ref_logits = ref_model.lm_head(dec).numpy()
    # Reference loss formula (whisper_dist.py:583-600), unmasked mean.
    loss_fn = tf.keras.losses.SparseCategoricalCrossentropy(
        from_logits=True, reduction="none")
    ref_loss = float(tf.reduce_mean(
        loss_fn(labels[:, 1:], ref_logits[:, :-1, :])))

    ours = model.apply({"params": params}, jnp.asarray(feats),
                       labels=jnp.asarray(labels), deterministic=True)
    _assert_close(ours["logits"], ref_logits, "lm logits")
    assert abs(float(ours["loss"]) - ref_loss) / abs(ref_loss) < 1e-3


# ---------------------------------------------------------------------------
# Wav2Vec2


@pytest.fixture(scope="module")
def ref_w2v2():
    return _load(W2V2_REF, "ref_wav2vec2_dist")


def _gn(layer):
    return {"gamma": layer.gamma.numpy(), "beta": layer.beta.numpy()}


def port_w2v2_weights(ref_model):
    """Structural TF->flax port for Wav2Vec2ForPreTraining (tiny preset)."""
    w = ref_model.wav2vec2
    fe = w.feature_extractor
    feature_extractor = {
        "pos_conv_embed": _dense(fe.pos_conv_embed),
        "layer_norm": _ln(fe.layer_norm),
    }
    for i, seq in enumerate(fe.conv_layers):
        conv, norm = seq.layers[0], seq.layers[1]
        feature_extractor[f"conv_{i}"] = {"kernel": conv.kernel.numpy()}
        feature_extractor[f"norm_{i}"] = _gn(norm)
    encoder = {}
    for i, layer in enumerate(w.encoder.layers):
        encoder[f"layers_{i}"] = {
            "attention": _attn(layer.attention),
            "attention_layer_norm": _ln(layer.attention_layer_norm),
            "feed_forward": {
                "intermediate_dense": _dense(layer.feed_forward.intermediate_dense),
                "output_dense": _dense(layer.feed_forward.output_dense),
            },
            "feed_forward_layer_norm": _ln(layer.feed_forward_layer_norm),
        }
    def proj_head(p):
        return {"projection_head": _dense(p.dense), "layer_norm": _ln(p.layer_norm)}
    params = {"wav2vec2": {
        "feature_extractor": feature_extractor,
        "feature_projection": _dense(w.feature_projection),
        "feature_projection_layer_norm": _ln(w.feature_projection_layer_norm),
        "encoder": encoder,
        "quantizer": {
            "codevectors": w.quantizer.codevectors.numpy(),
            "project_to_codevector_dim": _dense(w.quantizer.projection),
        },
        "project_hid": proj_head(w.project_hid),
        "project_q": proj_head(w.project_q),
    }}
    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.fixture(scope="module")
def w2v2_pair(ref_w2v2):
    from tethys_tpu.models.wav2vec2 import create_full_model

    cfg = ref_w2v2.Wav2Vec2Config("tiny")
    cfg.hidden_dropout = cfg.activation_dropout = cfg.attention_dropout = 0.0
    tf.random.set_seed(0)
    ref_model = ref_w2v2.Wav2Vec2ForPreTraining(cfg)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 4000), dtype=np.float32)
    ref_model(tf.constant(audio), training=True)  # build weights

    model, our_cfg = create_full_model(
        "pretraining", "tiny",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        compute_dtype="float32",
    )
    params = port_w2v2_weights(ref_model)
    return ref_model, model, params, our_cfg, audio


def test_w2v2_forward_parity(w2v2_pair):
    """Feature extractor, encoder, quantizer and projection heads vs the
    reference's own classes on identical inputs and ported weights."""
    ref_model, model, params, cfg, audio = w2v2_pair
    ref_out = ref_model(tf.constant(audio), training=True)
    ours = model.apply({"params": params}, jnp.asarray(audio), training=True)

    _assert_close(ours["extract_features"],
                  ref_out["extract_features"].numpy(), "extract_features")
    _assert_close(ours["last_hidden_state"],
                  ref_out["last_hidden_state"].numpy(), "encoder output")
    _assert_close(ours["quantized_features"],
                  ref_out["quantized_features"].numpy(), "quantized features")
    _assert_close(float(ours["codevector_perplexity"]),
                  float(ref_out["codevector_perplexity"]), "perplexity")
    _assert_close(ours["projected_states"],
                  ref_out["projected_states"].numpy(), "projected states")
    _assert_close(ours["projected_quantized_features"],
                  ref_out["projected_quantized_features"].numpy(),
                  "projected quantized")


def test_w2v2_losses_parity_matched_negatives(w2v2_pair):
    """Contrastive + diversity losses vs the reference, with the SAME
    negative set injected on both sides (the samplers are RNG-incompatible
    by construction: tf.random vs jax PRNG)."""
    from tethys_tpu import losses as our_losses

    ref_model, model, params, cfg, audio = w2v2_pair
    ref_out = ref_model(tf.constant(audio), training=True)

    t = int(ref_out["projected_states"].shape[1])
    k = cfg.num_negatives
    fixed = np.random.default_rng(7).integers(0, t, size=(2, k)).astype(np.int32)
    tiled = np.tile(fixed[:, None, :], (1, t, 1))  # ref's [B, T, K] layout

    ref_model._sample_negative_indices = (
        lambda seq_len, batch_size: tf.constant(tiled))
    ref_logits, ref_contrastive = ref_model._compute_contrastive_loss(
        ref_out["projected_states"], ref_out["projected_quantized_features"])
    ref_diversity = ref_model._compute_diversity_loss(
        ref_out["codevector_perplexity"])

    # Same inputs on both sides: this test pins the LOSS semantics alone
    # (forward parity is test_w2v2_forward_parity; feeding each side its own
    # forward would amplify f32 noise via the 1/temperature=10x scale).
    our_logits, our_contrastive = our_losses.contrastive_loss(
        jnp.asarray(ref_out["projected_states"].numpy()),
        jnp.asarray(ref_out["projected_quantized_features"].numpy()),
        jax.random.PRNGKey(0), num_negatives=k,
        temperature=cfg.contrastive_logits_temperature,
        negative_indices=jnp.asarray(fixed),
    )
    our_diversity = our_losses.diversity_loss(
        jnp.asarray(float(ref_out["codevector_perplexity"])))

    _assert_close(our_logits, ref_logits.numpy(), "contrastive logits")
    _assert_close(float(our_contrastive), float(ref_contrastive),
                  "contrastive loss")
    _assert_close(float(our_diversity), float(ref_diversity),
                  "diversity loss")
    # Total pretraining loss formula (reference wav2vec2_dist.py:1203-1221).
    ref_total = float(ref_contrastive) + cfg.diversity_loss_weight * float(
        ref_diversity)
    our_total = float(our_contrastive) + cfg.diversity_loss_weight * float(
        our_diversity)
    _assert_close(our_total, ref_total, "total pretraining loss")


def test_reference_codevectors_are_untracked_and_frozen(w2v2_pair):
    """Pins quirk #13: the reference declares its quantizer codevectors
    trainable=True (wav2vec2_dist.py:570-575) but as a raw tf.Variable
    attribute, which Keras 3 does not track.  The variable is absent from
    model.trainable_variables AND model.variables, so the reference's
    optimizer never updates it, the global-norm clip never sees its
    gradient, and checkpoints never save it — the codebook is frozen at
    random init.  Our default (Wav2Vec2Config.freeze_codevectors=True)
    reproduces this via stop_gradient; this test pins the REFERENCE side
    so a TF/Keras upgrade that starts tracking the variable is caught."""
    ref_model = w2v2_pair[0]
    cv = ref_model.wav2vec2.quantizer.codevectors
    ids = {id(v) for v in ref_model.variables}
    t_ids = {id(v) for v in ref_model.trainable_variables}
    assert cv.trainable  # declared trainable...
    assert id(cv) not in t_ids  # ...but untracked by Keras
    assert id(cv) not in ids


def test_our_codevectors_gradient_is_zero_by_default(w2v2_pair):
    """Our side of quirk #13: with freeze_codevectors=True (default) the
    codevector gradient is exactly zero; with False it is nonzero."""
    from tethys_tpu import losses as our_losses
    from tethys_tpu.models.wav2vec2 import create_full_model

    _, model, params, cfg, audio = w2v2_pair

    def grad_norm(m):
        def loss_fn(p):
            out = m.apply({"params": p}, jnp.asarray(audio), training=True)
            _, con = our_losses.contrastive_loss(
                out["projected_states"],
                out["projected_quantized_features"],
                jax.random.PRNGKey(0), num_negatives=cfg.num_negatives,
                temperature=cfg.contrastive_logits_temperature)
            return con + cfg.diversity_loss_weight * our_losses.diversity_loss(
                out["codevector_perplexity"])

        g = jax.grad(loss_fn)(params)
        return float(jnp.linalg.norm(
            g["wav2vec2"]["quantizer"]["codevectors"].ravel()))

    assert grad_norm(model) == 0.0
    thawed, _ = create_full_model(
        "pretraining", "tiny",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        compute_dtype="float32", freeze_codevectors=False,
    )
    assert grad_norm(thawed) > 0.0
