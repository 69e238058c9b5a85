"""Pipeline-parallel trainer (parallel/pp.py) on the 8-device CPU mesh.

The GPipe schedule is a pure reformulation of the encoder layer loop:
equality is asserted against the DP trainer on a mesh with the same number
of data replicas (itself golden-tested against the reference semantics in
test_dp.py), exactly like the TP/SP trainer tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tethys_tpu.models.whisper import create_whisper_model
from tethys_tpu.parallel import dp, pp
from tethys_tpu.parallel.mesh import make_data_mesh


def _tiny_whisper(encoder_layers=4):
    model, config = create_whisper_model(
        "tiny",
        d_model=32, encoder_layers=encoder_layers, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=32,
        decoder_start_token_id=63,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((8, config.n_mels, 64)),
                        dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(3, 60, size=(8, 8)), dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        feats[:1], labels=labels[:1], deterministic=True,
    )["params"]
    return model, config, params, feats, labels


def test_pack_unpack_roundtrip():
    model, config, params, _, _ = _tiny_whisper()
    packed = pp.pack_params(params, config.encoder_layers)
    assert "layers_0" not in packed["other"]["model"]["encoder"]
    stack_leaf = jax.tree_util.tree_leaves(packed["stack"])[0]
    assert stack_leaf.shape[0] == config.encoder_layers
    restored = pp.unpack_params(packed, config.encoder_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_pp_step_matches_dp_step():
    """PP (data=2 x stage=4, 1 layer/stage, 2 microbatches) must equal DP
    (data=2) on identical data: same SUM-of-replica-losses, same params
    after one SGD step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, config, params, feats, labels = _tiny_whisper(encoder_layers=4)
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(7)

    def loss_fn(p, batch, rng_):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    params_host = jax.device_get(params)  # DP step donates its state
    dp_mesh = make_data_mesh(2)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=False)
    dp_out, loss_dp = dp_step(
        dp_state, dp.shard_batch((feats, labels), dp_mesh), rng)
    golden = jax.device_get(dp_out.params)

    mesh = pp.make_pp_mesh(8, pipeline_parallel=4)
    state = pp.init_pp_state(params, opt, mesh, config)
    step = pp.make_pp_train_step(model, opt, mesh, state,
                                 num_microbatches=2, deterministic=True)
    new_state, loss_pp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_pp), float(loss_dp), rtol=1e-5)
    unpacked = pp.unpack_params(jax.device_get(new_state.params),
                                config.encoder_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        unpacked, golden)


def test_pp_stack_actually_sharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, config, params, _, _ = _tiny_whisper(encoder_layers=4)
    mesh = pp.make_pp_mesh(8, pipeline_parallel=4)
    state = pp.init_pp_state(params, optax.sgd(1e-2), mesh, config)
    leaf = state.params["stack"]["self_attn"]["q_proj"]["kernel"]
    # [4, 32, 32] stacked, sharded 4-way on the stage dim
    assert {s.data.shape for s in leaf.addressable_shards} == {(1, 32, 32)}


def test_pp_step_with_remat_and_more_microbatches():
    """remat on, M=4, 2 layers/stage (data=2 x stage=2): the fill-drain
    schedule with real bubbles still matches DP."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, config, params, feats, labels = _tiny_whisper(encoder_layers=4)
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(9)

    def loss_fn(p, batch, rng_):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    params_host = jax.device_get(params)
    dp_mesh = make_data_mesh(2)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=False)
    dp_out, loss_dp = dp_step(
        dp_state, dp.shard_batch((feats, labels), dp_mesh), rng)
    golden = jax.device_get(dp_out.params)

    mesh = pp.make_pp_mesh(4, pipeline_parallel=2)  # data=2 x stage=2
    state = pp.init_pp_state(params, opt, mesh, config)
    step = pp.make_pp_train_step(model, opt, mesh, state,
                                 num_microbatches=4, remat=True,
                                 deterministic=True)
    new_state, loss_pp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_pp), float(loss_dp), rtol=1e-5)
    unpacked = pp.unpack_params(jax.device_get(new_state.params),
                                config.encoder_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        unpacked, golden)


def test_pp_grad_accum_matches_dp_grad_accum():
    """--pp x --grad_accum (round-4 fix: previously silently ignored): the
    PP step with grad_accum=2 must equal the DP step with grad_accum=2 —
    same mean-over-chunks loss/grad contract, same chunk boundaries."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, config, params, feats, labels = _tiny_whisper(encoder_layers=4)
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(11)

    def loss_fn(p, batch, rng_):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    params_host = jax.device_get(params)
    dp_mesh = make_data_mesh(2)
    dp_state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), dp_mesh)
    dp_step = dp.make_train_step(loss_fn, opt, dp_mesh, hardened=False,
                                 grad_accum=2)
    dp_out, loss_dp = dp_step(
        dp_state, dp.shard_batch((feats, labels), dp_mesh), rng)
    golden = jax.device_get(dp_out.params)

    mesh = pp.make_pp_mesh(8, pipeline_parallel=4)
    state = pp.init_pp_state(params, opt, mesh, config)
    step = pp.make_pp_train_step(model, opt, mesh, state,
                                 num_microbatches=2, deterministic=True,
                                 grad_accum=2)
    new_state, loss_pp = step(state, (feats, labels), rng)

    np.testing.assert_allclose(float(loss_pp), float(loss_dp), rtol=1e-5)
    unpacked = pp.unpack_params(jax.device_get(new_state.params),
                                config.encoder_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        unpacked, golden)


def test_pp_grad_accum_rejects_indivisible_batch():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    model, config, params, feats, labels = _tiny_whisper(encoder_layers=4)
    mesh = pp.make_pp_mesh(8, pipeline_parallel=4)
    state = pp.init_pp_state(params, optax.sgd(1e-2), mesh, config)
    step = pp.make_pp_train_step(model, optax.sgd(1e-2), mesh, state,
                                 num_microbatches=1, deterministic=True,
                                 grad_accum=3)  # local batch 4 % 3 != 0
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, (feats, labels), jax.random.PRNGKey(0))


def test_train_whisper_pipeline_parallel_e2e():
    """The --pp job path end to end (2 steps, tiny model, dp=4 x stage=2,
    dropout ON — the schedule's per-(layer, tick) rng streams)."""
    from tethys_tpu.train import jobs

    result, _, _ = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=2,
        num_batches=2,
        checkpointing=False,
        data_seq_len=64,
        config_overrides=dict(
            d_model=32, encoder_layers=4, encoder_attention_heads=2,
            decoder_layers=1, decoder_attention_heads=2, d_ff=64,
            n_mels=8, n_ctx=32, vocab_size=128, max_target_positions=128,
            decoder_start_token_id=101,
        ),
        pipeline_parallel=2,
        num_microbatches=2,
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses))
    # returned params are back in the canonical layers_{i} tree
    assert "layers_0" in result.state.params["model"]["encoder"]
