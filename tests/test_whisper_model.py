"""Whisper model unit tests: shapes, loss semantics, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.configs import WhisperConfig
from tethys_tpu.models.whisper import (
    WhisperForConditionalGeneration,
    create_whisper_model,
    greedy_generate,
)


@pytest.fixture(scope="module")
def tiny_setup():
    config = WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4, d_ff=128,
        n_mels=8, n_ctx=32, vocab_size=50, max_target_positions=16,
        decoder_start_token_id=47,
    )
    model = WhisperForConditionalGeneration(config)
    rng = jax.random.PRNGKey(0)
    features = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 64), dtype=np.float32)
    )
    labels = jnp.asarray(
        np.random.default_rng(1).integers(3, 40, size=(2, 10)), dtype=jnp.int32
    )
    params = model.init(
        {"params": rng, "dropout": rng}, features, labels=labels,
        deterministic=True,
    )["params"]
    return model, config, params, features, labels


def test_forward_shapes(tiny_setup):
    model, config, params, features, labels = tiny_setup
    out = model.apply({"params": params}, features, labels=labels,
                      deterministic=True)
    # encoder: T=64 → conv2 stride 2 → 32
    assert out["encoder_last_hidden_state"].shape == (2, 32, 64)
    assert out["logits"].shape == (2, 10, 50)
    assert out["loss"].shape == ()
    assert np.isfinite(float(out["loss"]))


def test_loss_is_shifted_ce(tiny_setup):
    """Loss must equal mean CE of logits[:, :-1] vs labels[:, 1:]."""
    model, config, params, features, labels = tiny_setup
    out = model.apply({"params": params}, features, labels=labels,
                      deterministic=True)
    logits = np.asarray(out["logits"], dtype=np.float64)
    lab = np.asarray(labels)
    shift_logits = logits[:, :-1]
    shift_labels = lab[:, 1:]
    logz = np.log(np.exp(shift_logits).sum(-1))
    ce = logz - np.take_along_axis(
        shift_logits, shift_labels[..., None], axis=-1
    )[..., 0]
    np.testing.assert_allclose(float(out["loss"]), ce.mean(), rtol=1e-4)


def test_teacher_forcing_shift(tiny_setup):
    """decoder_input_ids built from labels must equal explicit right-shift."""
    model, config, params, features, labels = tiny_setup
    shifted = jnp.concatenate(
        [jnp.full((2, 1), config.decoder_start_token_id, dtype=labels.dtype),
         labels[:, :-1]], axis=1,
    )
    out_auto = model.apply({"params": params}, features, labels=labels,
                           deterministic=True)
    out_explicit = model.apply(
        {"params": params}, features, decoder_input_ids=shifted,
        labels=labels, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_auto["logits"]), np.asarray(out_explicit["logits"]),
        rtol=1e-5, atol=1e-5,
    )


def test_causal_masking(tiny_setup):
    """Changing a future label must not affect earlier logits."""
    model, config, params, features, labels = tiny_setup
    out1 = model.apply({"params": params}, features, labels=labels,
                       deterministic=True)
    labels2 = labels.at[:, -1].set(5)
    out2 = model.apply({"params": params}, features, labels=labels2,
                       deterministic=True)
    # positions < T-1 see identical inputs (the change enters at input T-1)
    np.testing.assert_allclose(
        np.asarray(out1["logits"][:, :-1]), np.asarray(out2["logits"][:, :-1]),
        rtol=1e-5, atol=1e-5,
    )


def test_generate_matches_uncached_argmax(tiny_setup):
    """KV-cached greedy decode must equal the naive full-prefix argmax loop."""
    model, config, params, features, _ = tiny_setup
    max_len = 8
    tokens, length = jax.jit(
        lambda v, f: greedy_generate(model, v, f, max_length=max_len)
    )({"params": params}, features)
    tokens = np.asarray(tokens)

    # Naive reference loop (recompute full prefix each step, like the
    # reference generate()).
    ids = np.full((2, 1), config.decoder_start_token_id, dtype=np.int32)
    for _ in range(max_len):
        out = model.apply(
            {"params": params}, features, decoder_input_ids=jnp.asarray(ids),
            deterministic=True,
        )
        nxt = np.argmax(np.asarray(out["logits"][:, -1, :]), axis=-1)
        ids = np.concatenate([ids, nxt[:, None].astype(np.int32)], axis=1)
        if np.all(nxt == config.eos_token_id):
            break
    np.testing.assert_array_equal(tokens[:, : ids.shape[1]], ids)


def test_size_presets():
    _, cfg_tiny = create_whisper_model("tiny")
    assert (cfg_tiny.d_model, cfg_tiny.encoder_layers) == (384, 4)
    _, cfg_base = create_whisper_model("base")
    assert (cfg_base.d_model, cfg_base.encoder_layers, cfg_base.d_ff) == (
        512, 6, 2048,
    )
    _, cfg_small = create_whisper_model("small")
    # Reference quirk: "small" is 768-d but only 4+4 layers.
    assert (cfg_small.d_model, cfg_small.encoder_layers) == (768, 4)
    _, cfg_large = create_whisper_model("large")
    assert (cfg_large.d_model, cfg_large.encoder_layers) == (1280, 32)


def test_prepare_inputs_for_generation(tiny_setup):
    model, config, params, features, labels = tiny_setup
    ids = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    out = model.apply({"params": params}, ids, past_key_values="sentinel",
                      method=model.prepare_inputs_for_generation)
    np.testing.assert_array_equal(np.asarray(out["decoder_input_ids"]),
                                  [[3]])  # last token only when cache present
    out2 = model.apply({"params": params}, ids,
                       method=model.prepare_inputs_for_generation)
    np.testing.assert_array_equal(np.asarray(out2["decoder_input_ids"]),
                                  np.asarray(ids))


def test_generate_chunked_early_stop_matches_plain(tiny_setup):
    """early_stop_chunk (while-of-scans) must be output-identical to the
    plain fixed-length scan — both without EOS (runs all chunks) and with
    a guaranteed global EOS at step 1 (exits after the first chunk).  A
    non-dividing chunk is rejected up front: whole chunks run to
    completion, so it would overrun max_length (positional-table reads
    past max_target_positions when max_length equals it) and do MORE work
    than the plain scan in the no-EOS case."""
    import pytest

    model, config, params, features, labels = tiny_setup

    plain = greedy_generate(model, {"params": params}, features,
                            max_length=12)
    for chunk in (3, 4, 6, 12):
        chunked = greedy_generate(model, {"params": params}, features,
                                  max_length=12, early_stop_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(plain[0]),
                                      np.asarray(chunked[0]))
        assert int(plain[1]) == int(chunked[1])
    with pytest.raises(ValueError, match="must divide"):
        greedy_generate(model, {"params": params}, features,
                        max_length=12, early_stop_chunk=5)

    # Exercise the genuine early EXIT: batch 1, and declare whatever token
    # the model actually emits first to be EOS — `done` then triggers at
    # step 1 and the while loop must stop after its first chunk with
    # identical outputs.
    import dataclasses

    first_tok = int(np.asarray(plain[0])[0, 1])
    eos_config = dataclasses.replace(config, eos_token_id=first_tok)
    eos_model = type(model)(eos_config)
    p1 = greedy_generate(eos_model, {"params": params}, features[:1],
                         max_length=12)
    c1 = greedy_generate(eos_model, {"params": params}, features[:1],
                         max_length=12, early_stop_chunk=4)
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(c1[0]))
    assert int(p1[1]) == int(c1[1]) == 2  # start + the EOS step


def test_remat_layers_matches_plain(tiny_setup):
    """config.remat_layers must be a pure memory/compute trade: identical
    loss AND grads to the unrematted model on the same params (per-layer
    nn.remat replays each layer's interior in the backward — numerics are
    bitwise-identical recomputations of the same ops)."""
    import dataclasses

    model, config, params, features, labels = tiny_setup
    remat_model = type(model)(dataclasses.replace(config, remat_layers=True))

    def loss(m):
        def f(p):
            out = m.apply(
                {"params": p}, features, labels=labels,
                deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return out["loss"]
        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(remat_model))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_layers_generate_unchanged(tiny_setup):
    """The cached decode path must be untouched by remat_layers (the
    training-only gate: caches is not None skips the nn.remat wrap)."""
    import dataclasses

    model, config, params, features, labels = tiny_setup
    remat_model = type(model)(dataclasses.replace(config, remat_layers=True))
    plain = greedy_generate(model, {"params": params}, features, max_length=8)
    remat = greedy_generate(remat_model, {"params": params}, features,
                            max_length=8)
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(remat[0]))


def test_make_chunked_greedy_matches_plain(tiny_setup):
    """Host-chunked greedy decode (VERDICT r3 item 9: python loop of ONE
    jitted C-step chunk — compiles on toolchains where while-of-scans does
    not) must be token-identical to the plain scan, and must stop
    dispatching chunks after a global EOS."""
    import dataclasses

    from tethys_tpu.models.whisper import make_chunked_greedy

    model, config, params, features, labels = tiny_setup

    plain = greedy_generate(model, {"params": params}, features,
                            max_length=12)
    for chunk in (3, 4, 12):
        gen = make_chunked_greedy(model, max_length=12, chunk=chunk)
        tokens, length = gen({"params": params}, features)
        np.testing.assert_array_equal(np.asarray(plain[0]),
                                      np.asarray(tokens))
        assert int(plain[1]) == int(length)
        assert gen.chunks_run == 12 // chunk  # no EOS -> all chunks
    with pytest.raises(ValueError, match="must divide"):
        make_chunked_greedy(model, max_length=12, chunk=5)

    # Genuine early exit: declare the first emitted token EOS; the host
    # loop must dispatch exactly one chunk and match the plain outputs.
    first_tok = int(np.asarray(plain[0])[0, 1])
    eos_config = dataclasses.replace(config, eos_token_id=first_tok)
    eos_model = type(model)(eos_config)
    p1 = greedy_generate(eos_model, {"params": params}, features[:1],
                         max_length=12)
    gen = make_chunked_greedy(eos_model, max_length=12, chunk=4)
    tokens, length = gen({"params": params}, features[:1])
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(tokens))
    assert int(p1[1]) == int(length) == 2
    assert gen.chunks_run == 1


def test_large_v3_preset_forward():
    """large-v3 (BASELINE.json stretch config): n_mels=128, vocab 51866,
    v3 start token — preset flows through the conv stem and LM head.
    Trunk dims are overridden small here to keep the test cheap; the
    128-mel stem and 51866-way head are the v3-specific paths."""
    from tethys_tpu.models.whisper import create_whisper_model

    model, cfg = create_whisper_model(
        "large-v3", d_model=64, encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=128, n_ctx=32,
        dropout=0.0, attention_dropout=0.0)
    assert (cfg.n_mels, cfg.vocab_size, cfg.decoder_start_token_id) == (
        128, 51866, 50258)
    feats = jnp.zeros((2, 128, 64), jnp.float32)
    labels = jnp.array([[9, 8, 7, 6]] * 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, labels=labels,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, feats, labels=labels,
                      deterministic=True)
    assert out["logits"].shape == (2, 4, 51866)
    assert np.isfinite(float(out["loss"]))


def test_large_v3_full_trunk_shapes():
    """The un-overridden large-v3 preset matches OpenAI whisper-large-v3:
    1280-d, 32+32 layers, 20 heads, 128 mels."""
    from tethys_tpu.configs import WhisperConfig

    cfg = WhisperConfig.from_size("large-v3")
    assert (cfg.d_model, cfg.encoder_layers, cfg.decoder_layers,
            cfg.encoder_attention_heads, cfg.n_mels, cfg.vocab_size) == (
        1280, 32, 32, 20, 128, 51866)
