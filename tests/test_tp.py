"""Tensor-parallel (dp x tp) extension tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tethys_tpu.configs import WhisperConfig
from tethys_tpu.models.whisper import WhisperForConditionalGeneration
from tethys_tpu.parallel import dp, tp

TINY = dict(
    d_model=32, encoder_layers=1, encoder_attention_heads=2,
    decoder_layers=1, decoder_attention_heads=2, d_ff=64,
    n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=32,
    decoder_start_token_id=63,
)


def _setup(mesh):
    config = WhisperConfig(**TINY)
    model = WhisperForConditionalGeneration(config)
    rng = jax.random.PRNGKey(0)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 8, 64)),
        dtype=jnp.float32)
    labels = jnp.asarray(
        np.random.default_rng(1).integers(3, 40, (8, 10)), dtype=jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, feats[:1],
                        labels=labels[:1], deterministic=True)["params"]

    def loss_fn(p, batch, rng):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    return model, params, loss_fn, (feats, labels)


def test_mesh_and_shardings():
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    _, params, _, _ = _setup(mesh)
    shardings = tp.param_shardings(params, mesh)
    enc_layer = shardings["model"]["encoder"]["layers_0"]
    assert enc_layer["self_attn"]["q_proj"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model")
    assert enc_layer["self_attn"]["out_proj"]["kernel"].spec == \
        jax.sharding.PartitionSpec("model", None)
    assert enc_layer["feed_forward"]["fc1"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model")
    assert shardings["lm_head"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model")
    # norms replicated
    assert enc_layer["self_attn_layer_norm"]["scale"].spec == \
        jax.sharding.PartitionSpec()


def test_tp_step_matches_dp_step():
    """TP (data=4 x model=2) must equal DP (data=4) on identical data: the
    round-3 contract is that --tp keeps the reference aggregation semantics
    (SUM-of-replica-losses per model-parallel group), so the DP step — which
    is golden-tested against the reference in test_dp.py — is the golden."""
    import optax

    from tethys_tpu.parallel.mesh import make_data_mesh

    mesh = tp.make_2d_mesh(8, model_parallel=2)
    model, params, loss_fn, batch = _setup(mesh)
    # SGD: linear in grads, so cross-device reduction-order rounding stays
    # proportional (Adam's first step is sign-sensitive on ~zero grads).
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(5)

    params_host = jax.device_get(params)  # DP step donates its state
    dp_mesh = make_data_mesh(4)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=False)
    dp_out, golden_loss = dp_step(
        dp_state, dp.shard_batch(batch, dp_mesh), rng)
    golden_params = jax.device_get(dp_out.params)

    state = tp.init_tp_state(params, opt, mesh)
    step = tp.make_tp_train_step(loss_fn, opt, mesh)
    new_state, loss = step(state, batch, rng)

    np.testing.assert_allclose(float(loss), float(golden_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(golden_params),
                    jax.tree_util.tree_leaves(jax.device_get(
                        new_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_hardened_golden():
    """The hardened chain (NaN scrub, 1/N_data, per-replica clip, SUM) on
    the (data=4, model=2) mesh with a 'model'-sharded param, computed
    explicitly — the --tp wav2vec2 contract (round-3 fix; reference
    speech_jobs/wav2vec2_dist.py:1186-1260)."""
    import optax

    rng = np.random.default_rng(9)
    x = (10.0 * rng.standard_normal((8, 4))).astype(np.float32)
    y = rng.standard_normal((8, 16)).astype(np.float32)
    w0 = rng.standard_normal((4, 16)).astype(np.float32)
    # name the leaf fc1/kernel so tp's Megatron rule shards it over 'model'
    params = {"fc1": {"kernel": jnp.asarray(w0)}}

    def loss_fn(p, batch, rng_):
        del rng_
        xb, yb = batch
        return jnp.mean((xb @ p["fc1"]["kernel"] - yb) ** 2), {}

    opt = optax.sgd(1.0)
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    state = tp.init_tp_state(params, opt, mesh)
    k = state.params["fc1"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(4, 8)}, \
        "fc1 kernel must be model-sharded for this test to mean anything"
    step = tp.make_tp_train_step(loss_fn, opt, mesh, hardened=True)
    new_state, loss = step(
        state, (jnp.asarray(x), jnp.asarray(y)), jax.random.PRNGKey(0))

    losses, grads = [], []
    for i in range(4):
        xs, ys = x[i * 2:(i + 1) * 2], y[i * 2:(i + 1) * 2]
        l, g = jax.value_and_grad(
            lambda w: jnp.mean((xs @ w - ys) ** 2) / 4)(jnp.asarray(w0))
        losses.append(float(l))
        gnorm = np.linalg.norm(np.asarray(g))
        grads.append(np.asarray(g) * min(1.0, 1.0 / max(gnorm, 1e-12)))
    np.testing.assert_allclose(float(loss), np.sum(losses), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params["fc1"]["kernel"]),
        w0 - np.sum(grads, axis=0), rtol=1e-4)
    # the update must not have destroyed the Megatron sharding
    k = new_state.params["fc1"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(4, 8)}


def test_tp_params_actually_sharded():
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    _, params, _, _ = _setup(mesh)
    sharded = tp.shard_params(params, mesh)
    k = sharded["model"]["encoder"]["layers_0"]["feed_forward"]["fc1"]["kernel"]
    # fc1 kernel [32, 64] sharded over 'model' (2): each shard [32, 32]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(32, 32)}


def test_conv_and_quantizer_sharding_rules():
    """Round-2 hardening: conv kernels + quantizer shard too (not replicated)."""
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    _, params, _, _ = _setup(mesh)
    shardings = tp.param_shardings(params, mesh)
    enc = shardings["model"]["encoder"]
    assert enc["conv1"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    assert enc["conv2"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")

    from tethys_tpu.models.wav2vec2 import create_full_model

    w2v, _ = create_full_model("pretraining", "tiny")
    rng = jax.random.PRNGKey(0)
    audio = jnp.zeros((1, 2000), jnp.float32)
    w_params = w2v.init({"params": rng, "dropout": rng}, audio,
                        training=True, deterministic=True)["params"]
    w_shardings = tp.param_shardings(w_params, mesh)
    wv = w_shardings["wav2vec2"]
    assert wv["feature_extractor"]["conv_1"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    # grouped positional conv stays replicated
    assert wv["feature_extractor"]["pos_conv_embed"]["kernel"].spec == \
        jax.sharding.PartitionSpec()
    assert wv["quantizer"]["codevectors"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert wv["quantizer"]["project_to_codevector_dim"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model")


def test_tp_medium_shaped_layers_with_remat():
    """dp=2 x tp=4 mesh running whisper-MEDIUM-shaped layers (d_model=1024,
    16 heads, d_ff=4096) with remat — the round-2 'harden toward
    medium/large' criterion, on the 8-device CPU mesh."""
    import optax

    mesh = tp.make_2d_mesh(8, model_parallel=4)
    config = WhisperConfig(
        d_model=1024, encoder_layers=2, encoder_attention_heads=16,
        decoder_layers=2, decoder_attention_heads=16, d_ff=4096,
        n_mels=16, n_ctx=32, vocab_size=128, max_target_positions=32,
        decoder_start_token_id=120,
    )
    model = WhisperForConditionalGeneration(config)
    rng = jax.random.PRNGKey(0)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16, 64)), jnp.float32)
    labels = jnp.asarray(
        np.random.default_rng(1).integers(3, 100, (4, 8)), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, feats[:1],
                        labels=labels[:1], deterministic=True)["params"]

    def loss_fn(p, batch, rng):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    opt = optax.adam(1e-4, mu_dtype=jnp.float32)
    state = tp.init_tp_state(params, opt, mesh)
    step = tp.make_tp_train_step(loss_fn, opt, mesh, remat=True)
    new_state, loss = step(state, (feats, labels), rng)
    assert np.isfinite(float(loss))
    # fc1 kernel [1024, 4096] sharded 4-way on the output dim
    k = new_state.params["model"]["encoder"]["layers_0"]["feed_forward"][
        "fc1"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(1024, 1024)}


def test_train_whisper_tensor_parallel_e2e(tmp_path):
    """The --tp job path end to end (2 steps, tiny model, dp=4 x tp=2)."""
    from tethys_tpu.train import jobs

    result, _, _ = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=1,
        num_batches=2,
        checkpointing=False,
        data_seq_len=64,
        config_overrides=dict(
            TINY, vocab_size=128, max_target_positions=128,
            decoder_start_token_id=101,
        ),
        tensor_parallel=2,
        remat=True,
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))


def test_train_wav2vec2_tensor_parallel_e2e(tmp_path):
    """The wav2vec2 --tp job path end to end (2 steps, tiny model,
    dp=4 x tp=2): conv-stack, quantizer-codebook, and trunk shardings all
    exercised through the real training entry point."""
    from tethys_tpu.train import jobs

    result, _, _ = jobs.train_wav2vec2(
        model_type="pretraining",
        model_size="tiny",
        batch_size_per_replica=1,
        num_batches=2,
        checkpointing=False,
        audio_length=4000,
        config_overrides=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64,
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
            num_codevectors_per_group=12, num_codevector_groups=2,
            codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
        ),
        tensor_parallel=2,
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))


def test_tp_sharded_generate_matches_unsharded():
    """Serving composes with TP: `greedy_generate` under Megatron-sharded
    params (data=1 x model=2 mesh) must emit exactly the tokens and length
    of the unsharded decode — GSPMD partitions the encode (flash wrapper's
    head rules), the KV-cached decode steps, and the vocab-sharded lm_head
    argmax without semantic drift.  Extension proof: multi-chip whisper
    serving (reference serves nothing, SURVEY §2.3 inference utils)."""
    from tethys_tpu.models.whisper import greedy_generate

    mesh = tp.make_2d_mesh(2, model_parallel=2)
    model, params, _, (feats, _) = _setup(mesh)

    def gen(v, f):
        return greedy_generate(model, v, f, max_length=12)

    tokens_ref, len_ref = jax.jit(gen)({"params": params}, feats)

    sharded = tp.shard_params(params, mesh)
    kern = sharded["model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert {s.data.shape for s in kern.addressable_shards} == {(32, 16)}
    tokens_tp, len_tp = jax.jit(gen)({"params": sharded}, feats)

    np.testing.assert_array_equal(np.asarray(tokens_ref),
                                  np.asarray(tokens_tp))
    assert int(len_ref) == int(len_tp)


def test_w2v2_tp_hardened_step_matches_dp_step():
    """The hardened TP step on the REAL wav2vec2 pretraining model
    (data=4 x model=2; Megatron-sharded trunk, conv stack, and quantizer
    codebook) must equal the hardened DP step (data=4) on identical data —
    loss contract AND params.  Completes the real-model equality matrix:
    whisper TP (above), wav2vec2 SP (test_sp.py), wav2vec2 TP (here)."""
    import optax
    import pytest

    from tethys_tpu.models import wav2vec2 as w2v_lib
    from tethys_tpu.parallel.mesh import make_data_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")

    model, config = w2v_lib.create_full_model(
        "pretraining", "tiny",
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
        num_codevectors_per_group=12, num_codevector_groups=2,
        codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
    )
    rng0 = np.random.default_rng(4)
    audio = jnp.asarray(rng0.standard_normal((8, 4000)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        audio[:1], training=True, deterministic=True)["params"]

    def loss_fn(p, batch, step_rng):
        rng_dropout, rng_neg = jax.random.split(step_rng)
        out = model.apply({"params": p}, batch[0], training=True,
                          deterministic=True, rngs={"dropout": rng_dropout})
        return w2v_lib.pretraining_loss(config, out, rng_neg)

    opt = optax.sgd(1e-3)
    rng = jax.random.PRNGKey(11)
    batch = (audio,)

    params_host = jax.device_get(params)  # DP step donates its state
    dp_mesh = make_data_mesh(4)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=True)
    dp_out, loss_dp = dp_step(dp_state, dp.shard_batch(batch, dp_mesh), rng)
    golden = jax.device_get(dp_out.params)

    mesh = tp.make_2d_mesh(8, model_parallel=2)
    state = tp.init_tp_state(params, opt, mesh)
    kern = state.params["wav2vec2"]["encoder"]["layers_0"]["attention"][
        "q_proj"]["kernel"]
    assert {s.data.shape for s in kern.addressable_shards} == {(32, 16)}, \
        "trunk must be Megatron-sharded for this test to mean anything"
    step = tp.make_tp_train_step(loss_fn, opt, mesh, hardened=True)
    new_state, loss_tp = step(state, batch, rng)

    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6),
        jax.device_get(new_state.params), golden)


def test_tp_with_remat_layers_matches_dp():
    """config.remat_layers under the (data, model) mesh: the per-layer
    nn.remat regions must compose with the Megatron shardings (GSPMD
    partitions inside each remat region) and stay numerically equal to the
    plain DP step."""
    import optax
    import pytest

    from tethys_tpu.parallel.mesh import make_data_mesh

    config = WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4, d_ff=128,
        n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=16,
        decoder_start_token_id=60,
    )
    import dataclasses

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 64)), jnp.float32)
    labels = jnp.asarray(
        np.random.default_rng(1).integers(3, 60, (4, 8)), jnp.int32)
    rng = jax.random.PRNGKey(0)

    losses = {}
    params0 = None
    for name, remat_layers in (("plain", False), ("remat", True)):
        cfg = dataclasses.replace(config, remat_layers=remat_layers)
        model = WhisperForConditionalGeneration(cfg)
        params = model.init({"params": rng, "dropout": rng}, feats[:1],
                            labels=labels[:1], deterministic=True)["params"]

        def loss_fn(p, batch, step_rng):
            f, l = batch
            out = model.apply({"params": p}, f, labels=l, deterministic=True)
            return out["loss"], {}

        opt = optax.sgd(1e-2)
        if name == "plain":
            mesh = make_data_mesh(4)
            state = dp.replicate_state(
                dp.TrainState(params, opt.init(params)), mesh)
            step = dp.make_train_step(loss_fn, opt, mesh)
        else:
            mesh = tp.make_2d_mesh(8, model_parallel=2)
            state = tp.init_tp_state(params, opt, mesh)
            step = tp.make_tp_train_step(loss_fn, opt, mesh)
        batch = dp.shard_batch((feats, labels), mesh)
        new_state, loss = step(state, batch, rng)
        losses[name] = float(loss)
        k = np.asarray(
            jax.device_get(new_state.params["model"]["encoder"]["layers_0"][
                "feed_forward"]["fc1"]["kernel"]))
        if params0 is None:
            params0 = k
        else:
            np.testing.assert_allclose(k, params0, rtol=2e-5, atol=1e-6)

    assert losses["plain"] == pytest.approx(losses["remat"], rel=1e-5)


def test_train_whisper_large_v3_tp_e2e(tmp_path):
    """large-v3's v3-specific paths (128-mel conv stem, 51866-token head,
    v3 start token) through the real --tp training entry point at tiny
    trunk dims: the preset's n_mels/vocab are NOT overridden."""
    from tethys_tpu.train import jobs

    result, _, config = jobs.train_whisper(
        model_type="large-v3",
        batch_size_per_replica=1,
        num_batches=2,
        checkpointing=False,
        data_seq_len=64,
        config_overrides=dict(
            d_model=32, encoder_layers=1, encoder_attention_heads=2,
            decoder_layers=1, decoder_attention_heads=2, d_ff=64,
            n_ctx=32, max_target_positions=128,
        ),
        tensor_parallel=2,
        remat=True,
    )
    assert (config.n_mels, config.vocab_size) == (128, 51866)
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))
