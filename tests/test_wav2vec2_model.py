"""Wav2Vec2 model unit tests: conv arithmetic, quantizer, heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.configs import Wav2Vec2Config
from tethys_tpu.models.wav2vec2 import (
    Wav2Vec2ForCTC,
    Wav2Vec2ForPreTraining,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2Quantizer,
    create_full_model,
    pretraining_loss,
)


def tiny_config(**overrides):
    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
        num_codevectors_per_group=12, num_codevector_groups=2,
        codevector_dim=16, proj_codevector_dim=16,
        num_negatives=6, classifier_proj_size=16, vocab_size=32,
    )
    base.update(overrides)
    return Wav2Vec2Config(**base)


@pytest.fixture(scope="module")
def audio():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 800), dtype=np.float32)
    )


def test_conv_downsampling_same_padding(audio):
    """Output length must follow TF 'SAME' ceil-division arithmetic."""
    from tethys_tpu.models.wav2vec2 import Wav2Vec2Model

    cfg = tiny_config()
    model = Wav2Vec2Model(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, audio,
                        training=False)["params"]
    out = model.apply({"params": params}, audio, training=False)
    expect_t = cfg.downsampled_length(800)  # ceil(800/5)=160, ceil(160/2)=80
    assert expect_t == 80
    assert out["last_hidden_state"].shape == (2, 80, cfg.hidden_size)
    assert out["extract_features"].shape == (2, 80, cfg.conv_dim[-1])


def test_base_preset_downsample_x320():
    cfg = Wav2Vec2Config.from_size("base")
    assert cfg.downsampled_length(32000) == 100  # 2 s -> 100 frames
    assert cfg.downsampled_length(80000) == 250  # 5 s -> 250 frames


def test_quantizer_argmin_and_perplexity():
    cfg = tiny_config()
    quant = Wav2Vec2Quantizer(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 7, cfg.hidden_size),
                                                 dtype=np.float32)
    )
    variables = quant.init(rng, x)
    out = quant.apply(variables, x)

    groups = cfg.num_codevector_groups
    vectors = cfg.num_codevectors_per_group
    group_dim = cfg.codevector_dim // groups
    assert out["quantized_features"].shape == (2, 7, cfg.codevector_dim)
    assert out["encodings"].shape == (groups, 2, 7, vectors)
    assert out["distances"].shape == (groups, 2, 7, vectors)

    # Golden check: naive distance computation (the reference's broadcast
    # form) must give the same argmin and quantized output.
    codevectors = np.asarray(variables["params"]["codevectors"])
    kernel = np.asarray(
        variables["params"]["project_to_codevector_dim"]["kernel"]
    )
    bias = np.asarray(variables["params"]["project_to_codevector_dim"]["bias"])
    projected = np.asarray(x) @ kernel + bias
    h = projected.reshape(2, 7, groups, group_dim)
    quantized_groups = []
    for g in range(groups):
        diff = h[:, :, g, None, :] - codevectors[g][None, None, :, :]
        dist = np.sum(diff ** 2, axis=-1)  # [B, T, V]
        idx = np.argmin(dist, axis=-1)
        np.testing.assert_array_equal(
            idx, np.argmin(np.asarray(out["distances"][g]), axis=-1)
        )
        quantized_groups.append(codevectors[g][idx])
    golden = np.concatenate(quantized_groups, axis=-1)
    np.testing.assert_allclose(
        np.asarray(out["quantized_features"]), golden, rtol=1e-4, atol=1e-5
    )

    # Perplexity bounded by codebook size, positive.
    p = float(out["codevector_perplexity"])
    assert 1.0 <= p <= vectors


def test_pretraining_forward_and_loss(audio):
    cfg = tiny_config()
    model = Wav2Vec2ForPreTraining(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, audio,
                        training=True)["params"]
    out = model.apply({"params": params}, audio, training=True,
                      rngs={"dropout": rng})
    assert out["projected_states"].shape == (2, 80, cfg.proj_codevector_dim)
    assert out["projected_quantized_features"].shape == (
        2, 80, cfg.proj_codevector_dim,
    )
    loss, aux = pretraining_loss(cfg, out, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert aux["logits"].shape == (2, 80, 1 + cfg.num_negatives)
    # loss = contrastive + 0.1 * (-perplexity)
    np.testing.assert_allclose(
        float(loss),
        float(aux["contrastive_loss"])
        + cfg.diversity_loss_weight * float(aux["diversity_loss"]),
        rtol=1e-6,
    )


def test_ctc_head_dummy_and_real(audio):
    cfg = tiny_config()
    labels = jnp.asarray([[5, 6, 7, 0], [8, 9, 0, 0]], dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)

    dummy_model = Wav2Vec2ForCTC(cfg, real_ctc=False)
    params = dummy_model.init({"params": rng, "dropout": rng}, audio,
                              labels=labels, training=True)["params"]
    out = dummy_model.apply({"params": params}, audio, labels=labels,
                            training=True, rngs={"dropout": rng})
    assert out["logits"].shape == (2, 80, cfg.vocab_size)
    assert np.isfinite(float(out["loss"]))

    real_model = Wav2Vec2ForCTC(cfg, real_ctc=True)
    out_real = real_model.apply({"params": params}, audio, labels=labels,
                                training=True, rngs={"dropout": rng})
    assert np.isfinite(float(out_real["loss"]))
    assert float(out_real["loss"]) != pytest.approx(float(out["loss"]))


def test_classification_head(audio):
    cfg = tiny_config()
    labels = jnp.asarray([1, 3], dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)
    model = Wav2Vec2ForSequenceClassification(cfg)
    params = model.init({"params": rng, "dropout": rng}, audio,
                        labels=labels, training=True)["params"]
    out = model.apply({"params": params}, audio, labels=labels,
                      training=True, rngs={"dropout": rng})
    assert out["logits"].shape == (2, cfg.num_labels)
    assert np.isfinite(float(out["loss"]))


def test_factory_sizes():
    _, cfg = create_full_model("pretraining", "base")
    assert cfg.hidden_size == 768 and len(cfg.conv_dim) == 7
    assert cfg.num_codevectors_per_group == 320
    _, cfg_tiny = create_full_model("asr", "tiny")
    assert cfg_tiny.hidden_size == 256 and len(cfg_tiny.conv_dim) == 4
    _, cfg_small = create_full_model("classification", "small")
    assert cfg_small.hidden_size == 512 and cfg_small.classifier_proj_size == 128
