"""Sequence-parallel trainer (parallel/sp.py) on the 8-device CPU mesh.

The SP step must be a pure reformulation: same losses/params as a plain
single-mesh jit step on identical data, with the encoder time axis actually
sharded (the compiled HLO must contain cross-'seq' collectives beyond the
data-parallel gradient reduction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.models.whisper import create_whisper_model
from tethys_tpu.parallel import dp, sp


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


def _loss_fn(model):
    def loss_fn(params, batch, rng):
        f, l = batch
        out = model.apply({"params": params}, f, labels=l,
                          deterministic=True)
        return out["loss"], {}
    return loss_fn


def test_sp_step_matches_plain_step():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import optax

    model, params, feats, labels = _tiny_whisper()
    loss_fn = _loss_fn(model)
    # SGD, not Adam: Adam's first-step update is ~lr*sign(grad), which
    # amplifies f32 cross-shard reduction-order noise on near-zero grads
    # into full-size update differences; SGD keeps the comparison
    # proportional to the grads themselves.
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(7)

    # Plain single-device baseline (no donation: params reused below).
    def plain_step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax_apply(params, updates), opt_state, loss

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    p_plain, s_plain, loss_plain = jax.jit(plain_step)(
        params, opt.init(params), (feats, labels))

    mesh = sp.make_seq_mesh(8, seq_parallel=4)  # data=2 x seq=4
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(loss_fn, opt, mesh)
    new_state, loss_sp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_sp), float(loss_plain), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        jax.device_get(new_state.params), jax.device_get(p_plain))


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
