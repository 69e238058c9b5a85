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


def test_tp_step_matches_single_device():
    """dp x tp jit step must produce the same params as a plain 1-device
    global-mean step (it is a pure re-sharding of the same computation)."""
    import optax

    mesh = tp.make_2d_mesh(8, model_parallel=2)
    model, params, loss_fn, batch = _setup(mesh)
    # SGD: linear in grads, so cross-device reduction-order rounding stays
    # proportional (Adam's first step is sign-sensitive on ~zero grads).
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(5)

    # single device golden
    def single_step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    golden_params, _, golden_loss = single_step(params, opt.init(params),
                                                batch)

    state = tp.init_tp_state(params, opt, mesh)
    step = tp.make_tp_train_step(loss_fn, opt, mesh)
    new_state, loss = step(state, batch, rng)

    np.testing.assert_allclose(float(loss), float(golden_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(golden_params),
                    jax.tree_util.tree_leaves(jax.device_get(
                        new_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_params_actually_sharded():
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    _, params, _, _ = _setup(mesh)
    sharded = tp.shard_params(params, mesh)
    k = sharded["model"]["encoder"]["layers_0"]["feed_forward"]["fc1"]["kernel"]
    # fc1 kernel [32, 64] sharded over 'model' (2): each shard [32, 32]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(32, 32)}
