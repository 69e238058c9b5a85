"""Checkpoint save/restore tests (restore is our extension — the reference
is write-only, SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tethys_tpu.checkpoint import CheckpointManager, save_final_weights
from tethys_tpu.parallel import dp
from tethys_tpu.parallel.mesh import make_data_mesh


def _setup():
    mesh = make_data_mesh(4)
    params = {"w": jnp.asarray(np.random.default_rng(0)
                               .standard_normal((4, 3)).astype(np.float32))}
    opt = optax.adam(1e-2)
    state = dp.TrainState(params, opt.init(params))

    def loss_fn(p, batch, rng):
        x, y = batch
        return jnp.mean((x @ p["w"] - y) ** 2), {}

    step = dp.make_train_step(loss_fn, opt, mesh, hardened=False)
    rng = np.random.default_rng(1)
    batch = (rng.standard_normal((8, 4)).astype(np.float32),
             rng.standard_normal((8, 3)).astype(np.float32))
    batch = dp.shard_batch(batch, mesh)
    return mesh, state, step, batch


def test_save_restore_roundtrip(tmp_path):
    mesh, state, step, batch = _setup()
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    key = jax.random.PRNGKey(0)
    state, _ = step(state, batch, key)
    saved = jax.device_get(state)
    mgr.save("model_step_1", state)

    restored = mgr.restore("model_step_1", jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.latest_tag() == "model_step_1"


def test_resume_equals_uninterrupted(tmp_path):
    """save@2 + restore + 2 more steps == 4 straight steps."""
    mesh, state0, step, batch = _setup()
    mgr = CheckpointManager(str(tmp_path / "c"))
    keys = [jax.random.PRNGKey(i) for i in range(4)]

    # straight 4 steps
    s = state0
    for k in keys:
        s, _ = step(s, batch, k)
    straight = jax.device_get(s)

    # interrupted at 2
    mesh2, state0b, step2, batch2 = _setup()
    s = state0b
    for k in keys[:2]:
        s, _ = step2(s, batch2, k)
    mgr.save("model_step_2", s)

    template = jax.device_get(s)
    restored = mgr.restore("model_step_2", template)
    restored = dp.replicate_state(dp.TrainState(*restored), mesh2)
    for k in keys[2:]:
        restored, _ = step2(restored, batch2, k)
    resumed = jax.device_get(restored)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_tp_sharded_resume_equals_uninterrupted(tmp_path):
    """Round-3 extension (VERDICT item 5): save@2 + restore_like into the
    live TP state's Megatron shardings + 2 more steps == 4 straight TP
    steps — `--tp 2 --resume` round-trips with sharded params."""
    import optax

    from tethys_tpu.parallel import tp

    mesh = tp.make_2d_mesh(8, model_parallel=2)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 4)).astype(np.float32)
    y = rng.standard_normal((8, 16)).astype(np.float32)
    params = {"fc1": {"kernel": jnp.asarray(
        rng.standard_normal((4, 16)).astype(np.float32))}}

    def loss_fn(p, batch, rng_):
        xb, yb = batch
        return jnp.mean((xb @ p["fc1"]["kernel"] - yb) ** 2), {}

    opt = optax.adam(1e-2)
    step = tp.make_tp_train_step(loss_fn, opt, mesh, hardened=True)
    batch = (jnp.asarray(x), jnp.asarray(y))
    keys = [jax.random.PRNGKey(i) for i in range(4)]
    mgr = CheckpointManager(str(tmp_path / "c"))

    s = tp.init_tp_state(params, opt, mesh)
    for k in keys:
        s, _ = step(s, batch, k)
    straight = jax.device_get(s)

    s = tp.init_tp_state(params, opt, mesh)
    for k in keys[:2]:
        s, _ = step(s, batch, k)
    mgr.save("tp_step_2", s)

    fresh = tp.init_tp_state(params, opt, mesh)  # pre-sharded live state
    restored = mgr.restore_like("tp_step_2", fresh)
    k_arr = restored.params["fc1"]["kernel"]
    assert {sh.data.shape for sh in k_arr.addressable_shards} == {(4, 8)}, \
        "restore_like must land params in their Megatron shardings"
    for k in keys[2:]:
        restored, _ = step(restored, batch, k)
    resumed = jax.device_get(restored)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pp_packed_resume_equals_uninterrupted(tmp_path):
    """--pp --resume round-trip: in-loop checkpoints stay in the packed
    (stage-sharded) {"other", "stack"} layout (train/jobs.py PP branch), so
    save@2 + restore_like into the live PP state + 2 more steps must equal
    4 straight PP steps, with the restored stack still stage-sharded."""
    import optax

    from tethys_tpu.models.whisper import create_whisper_model
    from tethys_tpu.parallel import pp

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 simulated devices")

    model, config = create_whisper_model(
        "tiny",
        d_model=32, encoder_layers=4, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, d_ff=64,
        n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=32,
        decoder_start_token_id=63,
    )
    rng_np = np.random.default_rng(3)
    feats = jnp.asarray(rng_np.standard_normal((8, config.n_mels, 64)),
                        dtype=jnp.float32)
    labels = jnp.asarray(rng_np.integers(3, 60, size=(8, 8)),
                         dtype=jnp.int32)
    params = jax.device_get(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        feats[:1], labels=labels[:1], deterministic=True,
    )["params"])
    opt = optax.sgd(1e-2)
    mesh = pp.make_pp_mesh(8, pipeline_parallel=4)
    keys = [jax.random.PRNGKey(i) for i in range(4)]
    mgr = CheckpointManager(str(tmp_path / "c"))

    def fresh():
        state = pp.init_pp_state(params, opt, mesh, config)
        step = pp.make_pp_train_step(model, opt, mesh, state,
                                     num_microbatches=2, deterministic=True)
        return state, step

    s, step = fresh()
    for k in keys:
        s, _ = step(s, (feats, labels), k)
    straight = jax.device_get(s)

    s, step = fresh()
    for k in keys[:2]:
        s, _ = step(s, (feats, labels), k)
    mgr.save("pp_step_2", s)

    live, step = fresh()
    restored = mgr.restore_like("pp_step_2", live)
    leaf = restored.params["stack"]["self_attn"]["q_proj"]["kernel"]
    assert {sh.data.shape for sh in leaf.addressable_shards} == \
        {(1, 32, 32)}, "restore_like must land the stack stage-sharded"
    for k in keys[2:]:
        restored, _ = step(restored, (feats, labels), k)
    resumed = jax.device_get(restored)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_final_weights_save(tmp_path, monkeypatch):
    monkeypatch.setenv("TETHYS_WORKSPACE", str(tmp_path))
    params = {"w": jnp.ones((2, 2))}
    path = save_final_weights(params, "model_x")
    assert path.endswith("model_cache/model_x")
    import os

    assert os.path.isdir(path)
