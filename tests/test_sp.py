"""Sequence-parallel trainer (parallel/sp.py) on the 8-device CPU mesh.

Round-3 contract: the SP step keeps the REFERENCE aggregation semantics —
SUM-of-replica-losses logging and (optionally) the hardened wav2vec2 chain —
per data replica (= sequence-parallel group), with the encoder time axis
actually sharded over 'seq' (the compiled HLO must carry cross-'seq'
collectives).  Equality is therefore asserted against the DP trainer on a
mesh with the same number of data replicas, which is itself golden-tested
against the reference semantics in test_dp.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tethys_tpu.models.whisper import create_whisper_model
from tethys_tpu.parallel import dp, sp
from tethys_tpu.parallel.mesh import make_data_mesh


def _tiny_whisper():
    # T divisible by seq=4 everywhere: n_ctx 32, conv stride halves 64 -> 32.
    model, config = create_whisper_model(
        "tiny",
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=32,
        decoder_start_token_id=63,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, config.n_mels, 64)),
                        dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(3, 60, size=(4, 8)), dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        feats[:1], labels=labels[:1], deterministic=True,
    )["params"]
    return model, params, feats, labels


def _loss_fn(model, deterministic=True):
    def loss_fn(params, batch, rng):
        f, l = batch
        if deterministic:
            out = model.apply({"params": params}, f, labels=l,
                              deterministic=True)
        else:
            out = model.apply({"params": params}, f, labels=l,
                              deterministic=False, rngs={"dropout": rng})
        return out["loss"], {}
    return loss_fn


def _dp_golden(model, params, feats, labels, rng, n_data=2, opt=None,
               hardened=False, deterministic=True):
    """Reference-semantics golden: the DP step on an n_data-device mesh."""
    opt = opt or optax.sgd(1e-2)
    loss_fn = _loss_fn(model, deterministic)
    mesh = make_data_mesh(n_data)
    # Host copy: the DP step donates its state, and device_put may alias the
    # caller's buffers into the replicated state — donation would delete them.
    params = jax.device_get(params)
    state = dp.replicate_state(
        dp.TrainState(params, opt.init(params)), mesh)
    step = dp.make_train_step(loss_fn, opt, mesh, hardened=hardened)
    new_state, loss = step(state, dp.shard_batch((feats, labels), mesh), rng)
    return jax.device_get(new_state.params), float(loss)


def test_sp_step_matches_dp_step():
    """SP (data=2 x seq=4) must equal DP (data=2) on identical data: same
    SUM-of-replica-losses, same params after one SGD step (the seq sharding
    is a pure reformulation within each replica)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, params, feats, labels = _tiny_whisper()
    # SGD, not Adam: Adam's first-step update is ~lr*sign(grad), which
    # amplifies f32 cross-shard reduction-order noise on near-zero grads
    # into full-size update differences; SGD keeps the comparison
    # proportional to the grads themselves.
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(7)
    p_dp, loss_dp = _dp_golden(model, params, feats, labels, rng, n_data=2,
                               opt=opt)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)  # data=2 x seq=4
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(_loss_fn(model), opt, mesh)
    new_state, loss_sp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_sp), loss_dp, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        jax.device_get(new_state.params), p_dp)


def test_sp_step_with_dropout_matches_dp_step():
    """VERDICT r2 item 7: the SP path with dropout ON (deterministic=False)
    and per-replica fold-in streams must equal the DP step — jax.random's
    counter-based threefry masks are sharding-invariant, so partitioning
    the time axis must not change which elements drop."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, params, feats, labels = _tiny_whisper()
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(11)
    p_dp, loss_dp = _dp_golden(model, params, feats, labels, rng, n_data=2,
                               opt=opt, deterministic=False)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(_loss_fn(model, deterministic=False), opt,
                                 mesh)
    new_state, loss_sp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_sp), loss_dp, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        jax.device_get(new_state.params), p_dp)


def _quadratic_loss_fn(params, batch, rng):
    del rng
    x, y = batch
    return jnp.mean((x @ params["w"] - y) ** 2), {}


def test_sp_golden_sum_semantics():
    """SUM-of-replica-losses on the (data=2, seq=4) mesh, computed
    explicitly (the test_dp.py golden, rerun through the SP trainer)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 4)).astype(np.float32)
    y = rng.standard_normal((4,)).astype(np.float32)
    w0 = rng.standard_normal(4).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    opt = optax.sgd(0.1)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(_quadratic_loss_fn, opt, mesh)
    new_state, loss = step(state, (jnp.asarray(x), jnp.asarray(y)),
                           jax.random.PRNGKey(0))

    losses, grads = [], []
    for i in range(2):
        xs, ys = x[i * 2:(i + 1) * 2], y[i * 2:(i + 1) * 2]
        l, g = jax.value_and_grad(
            lambda w: jnp.mean((xs @ w - ys) ** 2))(jnp.asarray(w0))
        losses.append(float(l))
        grads.append(np.asarray(g))
    np.testing.assert_allclose(float(loss), np.sum(losses), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params["w"]),
        w0 - 0.1 * np.sum(grads, axis=0), rtol=1e-5)


def test_sp_hardened_golden():
    """Hardened chain on the seq mesh: loss/N_data, per-replica clip, SUM."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    rng = np.random.default_rng(4)
    x = (10.0 * rng.standard_normal((4, 4))).astype(np.float32)  # big grads
    y = rng.standard_normal((4,)).astype(np.float32)
    w0 = rng.standard_normal(4).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    opt = optax.sgd(1.0)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(_quadratic_loss_fn, opt, mesh,
                                 hardened=True)
    new_state, loss = step(state, (jnp.asarray(x), jnp.asarray(y)),
                           jax.random.PRNGKey(0))

    losses, grads = [], []
    for i in range(2):
        xs, ys = x[i * 2:(i + 1) * 2], y[i * 2:(i + 1) * 2]
        l, g = jax.value_and_grad(
            lambda w: jnp.mean((xs @ w - ys) ** 2) / 2)(jnp.asarray(w0))
        losses.append(float(l))
        gnorm = np.linalg.norm(np.asarray(g))
        grads.append(np.asarray(g) * min(1.0, 1.0 / max(gnorm, 1e-12)))
    np.testing.assert_allclose(float(loss), np.sum(losses), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params["w"]),
        w0 - np.sum(grads, axis=0), rtol=1e-4)


def test_sp_step_actually_shards_sequence():
    """The lowered HLO must carry cross-'seq' collectives (all-gather /
    collective-permute), i.e. the time axis is genuinely partitioned —
    not silently replicated by GSPMD."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, params, feats, labels = _tiny_whisper()
    loss_fn = _loss_fn(model)
    opt = dp.whisper_optimizer(1e-3)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(loss_fn, opt, mesh)
    hlo = step.lower(state, (feats, labels),
                     jax.random.PRNGKey(0)).compile().as_text()
    assert ("all-gather" in hlo or "collective-permute" in hlo
            or "all-to-all" in hlo), "no sequence collectives in HLO"


W2V_TINY = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
    num_codevectors_per_group=12, num_codevector_groups=2,
    codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
)


def test_sp_hardened_wav2vec2_matches_dp():
    """Round-3: wav2vec2 gains the same SP hooks as Whisper (closes the
    round-2 asymmetry).  The hardened SP step (data=2 x seq=4; post-conv
    T=400 sharded over 'seq') must equal the hardened DP step (data=2) on
    identical data — loss contract AND params."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import optax

    from tethys_tpu.models import wav2vec2 as w2v_lib
    from tethys_tpu.parallel.mesh import make_data_mesh

    model, config = w2v_lib.create_full_model(
        "pretraining", "tiny", **W2V_TINY)
    rng0 = np.random.default_rng(0)
    audio = jnp.asarray(rng0.standard_normal((4, 4000)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        audio[:1], training=True, deterministic=True)["params"]

    def loss_fn(p, batch, step_rng):
        rng_dropout, rng_neg = jax.random.split(step_rng)
        out = model.apply({"params": p}, batch[0], training=True,
                          deterministic=True, rngs={"dropout": rng_dropout})
        return w2v_lib.pretraining_loss(config, out, rng_neg)

    opt = optax.sgd(1e-3)
    rng = jax.random.PRNGKey(3)
    batch = (audio,)

    params_host = jax.device_get(params)  # DP step donates its state
    dp_mesh = make_data_mesh(2)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=True)
    dp_out, loss_dp = dp_step(dp_state, dp.shard_batch(batch, dp_mesh), rng)
    golden = jax.device_get(dp_out.params)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(loss_fn, opt, mesh, hardened=True)
    new_state, loss_sp = step(state, batch, rng)

    np.testing.assert_allclose(float(loss_sp), float(loss_dp), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6),
        jax.device_get(new_state.params), golden)


def test_train_wav2vec2_seq_parallel_e2e():
    """The wav2vec2 --sp job path end to end (2 steps, tiny model,
    dp=2 x seq=4)."""
    from tethys_tpu.train import jobs

    result, _, _ = jobs.train_wav2vec2(
        model_type="pretraining",
        model_size="tiny",
        batch_size_per_replica=1,
        num_batches=2,
        checkpointing=False,
        audio_length=4000,
        config_overrides=W2V_TINY,
        seq_parallel=4,
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))
