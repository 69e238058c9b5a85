"""Flash attention under GSPMD meshes (the round-2 composition gap).

The pallas kernel is an opaque custom call; ops/pallas_attention.py teaches
the partitioner how to split it via custom_partitioning.  These tests verify,
on the 8-device CPU mesh in interpreter mode, that the sharded computation is
numerically identical to the unsharded one for every layout the trainers
produce:

* TP: heads sharded over 'model', batch over 'data'
* SP: query rows sharded over 'seq' (K/V gathered, dk/dv psum'd)
* nested: inside a partial-manual shard_map (the hardened trainer shape)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tethys_tpu.ops.pallas_attention as pa


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pa._INTERPRET
    pa._INTERPRET = True
    yield
    pa._INTERPRET = old


def _inputs(b=4, h=4, t=256, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    return q, k, v


def _loss(q, k, v, kv_len=None):
    return jnp.sum(jnp.sin(pa.flash_attention(q, k, v, kv_len=kv_len)))


def _golden(q, k, v, kv_len=None):
    out = jax.jit(pa.flash_attention, static_argnames=("kv_len",))(
        q, k, v, kv_len=kv_len)
    grads = jax.jit(jax.grad(_loss, argnums=(0, 1, 2)),
                    static_argnames=("kv_len",))(q, k, v, kv_len=kv_len)
    return out, grads


def _sharded_case(mesh, specs, kv_len=None):
    """Run fwd + grads with q/k/v placed at the given PartitionSpecs and
    compare to the unsharded golden."""
    q, k, v = _inputs()
    golden_out, golden_grads = _golden(q, k, v, kv_len=kv_len)

    qs = jax.device_put(q, NamedSharding(mesh, specs[0]))
    ks = jax.device_put(k, NamedSharding(mesh, specs[1]))
    vs = jax.device_put(v, NamedSharding(mesh, specs[2]))
    out = jax.jit(pa.flash_attention, static_argnames=("kv_len",))(
        qs, ks, vs, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden_out),
                               rtol=2e-5, atol=2e-5)
    grads = jax.jit(jax.grad(_loss, argnums=(0, 1, 2)),
                    static_argnames=("kv_len",))(qs, ks, vs, kv_len=kv_len)
    for g_ref, g in zip(golden_grads, grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_tp_head_sharded():
    """TP layout: batch over 'data', heads over 'model'."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    spec = P("data", "model", None, None)
    _sharded_case(mesh, (spec, spec, spec))


def test_sp_query_sharded():
    """SP layout: query rows over 'seq'; dk/dv need the psum path."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    spec = P("data", None, "seq", None)
    _sharded_case(mesh, (spec, spec, spec))


def test_sp_query_sharded_with_kv_len():
    """SP + padded KV masking (the whisper encoder pads 1500->1536)."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    spec = P("data", None, "seq", None)
    _sharded_case(mesh, (spec, spec, spec), kv_len=200)


def test_nested_in_partial_manual_shard_map():
    """Flash inside shard_map(axis_names={'data'}) with heads sharded over
    the auto 'model' axis — the hardened-TP-trainer shape.  Here the
    partition callbacks see GSPMDSharding (no .spec) and must pass the
    batch/head sharding through."""
    from jax import shard_map

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    q, k, v = _inputs()
    golden_out, golden_grads = _golden(q, k, v)

    def body(q, k, v):
        am = jax.sharding.get_abstract_mesh()
        constrain = functools.partial(
            jax.lax.with_sharding_constraint,
            shardings=NamedSharding(am, P(None, "model", None, None)))
        q, k, v = constrain(q), constrain(k), constrain(v)
        loss = _loss(q, k, v)
        out = pa.flash_attention(q, k, v)
        return jax.lax.psum(loss, "data"), out

    wrapped = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(), P("data")),
        axis_names={"data"}, check_vma=False,
    )
    sharding = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, sharding) for x in (q, k, v)]
    loss, out = jax.jit(wrapped)(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden_out),
                               rtol=2e-5, atol=2e-5)

    def grad_body(q, k, v):
        # grad of the LOCAL loss (dp.py's convention: the psum happens on
        # the grads afterwards; psum-before-grad double-counts under
        # check_vma=False's psum-transpose rule)
        am = jax.sharding.get_abstract_mesh()
        constrain = functools.partial(
            jax.lax.with_sharding_constraint,
            shardings=NamedSharding(am, P(None, "model", None, None)))
        q, k, v = constrain(q), constrain(k), constrain(v)
        return jax.grad(_loss, argnums=(0, 1, 2))(q, k, v)

    grads = jax.jit(shard_map(
        grad_body, mesh=mesh,
        in_specs=(P("data"),) * 3, out_specs=(P("data"),) * 3,
        axis_names={"data"}, check_vma=False,
    ))(*args)
    for g_ref, g in zip(golden_grads, grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def _tiny_whisper():
    from tethys_tpu.models.whisper import create_whisper_model

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


@pytest.fixture()
def _force_flash():
    """Route the tiny whisper's encoder attention (tq=32) onto the flash
    kernel on the CPU mesh: gate forced past the TPU check, min-seq lowered,
    kernels interpreted."""
    from tethys_tpu.ops import attention as attn

    saved = (attn._FLASH_FORCE, attn._FLASH_MIN_SEQ)
    attn._FLASH_FORCE, attn._FLASH_MIN_SEQ = True, 16
    yield
    attn._FLASH_FORCE, attn._FLASH_MIN_SEQ = saved


def _dp_sgd_step(model, params, feats, labels, rng, n_data):
    """Reference-semantics golden: the DP step (SUM-of-replica-losses) on an
    n_data-device mesh — the TP/SP trainers share its aggregation contract
    since round 3."""
    import optax

    from tethys_tpu.parallel import dp
    from tethys_tpu.parallel.mesh import make_data_mesh

    opt = optax.sgd(1e-2)

    def loss_fn(p, batch, rng):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    params_host = jax.device_get(params)  # the DP step donates its state
    mesh = make_data_mesh(n_data)
    state = dp.replicate_state(
        dp.TrainState(params_host, opt.init(params_host)), mesh)
    step = dp.make_train_step(loss_fn, opt, mesh, hardened=False)
    out, loss = step(state, dp.shard_batch((feats, labels), mesh), rng)
    return opt, loss_fn, jax.device_get(out.params), loss


def test_sp_trainer_step_with_flash_matches_plain(_force_flash):
    """Full whisper SP train step with use_flash=True == plain step (the
    VERDICT round-2 gap: flash had to be disabled under the seq mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from tethys_tpu.parallel import sp

    model, params, feats, labels = _tiny_whisper()
    assert model.config.use_flash_attention
    rng = jax.random.PRNGKey(7)
    opt, loss_fn, p_plain, loss_plain = _dp_sgd_step(
        model, params, feats, labels, rng, n_data=2)

    mesh = sp.make_seq_mesh(8, seq_parallel=4)
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(loss_fn, opt, mesh)
    new_state, loss_sp = step(state, (feats, labels), rng)
    np.testing.assert_allclose(float(loss_sp), float(loss_plain), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        jax.device_get(new_state.params), jax.device_get(p_plain))


def test_tp_trainer_step_with_flash_matches_plain(_force_flash):
    """Full whisper TP train step (Megatron shardings — heads sharded over
    'model') with use_flash=True == plain step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from tethys_tpu.parallel import tp

    model, params, feats, labels = _tiny_whisper()
    rng = jax.random.PRNGKey(7)
    opt, loss_fn, p_plain, loss_plain = _dp_sgd_step(
        model, params, feats, labels, rng, n_data=4)

    mesh = tp.make_2d_mesh(8, model_parallel=2)
    state = tp.init_tp_state(params, opt, mesh)
    step = tp.make_tp_train_step(loss_fn, opt, mesh)
    new_state, loss_tp = step(state, (feats, labels), rng)
    np.testing.assert_allclose(float(loss_tp), float(loss_plain), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        jax.device_get(new_state.params), jax.device_get(p_plain))


def test_uneven_local_query_block():
    """2-way seq sharding of 256 rows -> local 128; also 384 global -> 192
    local exercises the local re-pad path (192 % 128 != 0)."""
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("data", "seq"))
    q, k, v = _inputs(b=2, h=2, t=384, d=32, seed=3)
    golden_out, golden_grads = _golden(q, k, v)
    spec = P(None, None, "seq", None)
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    ks = jax.device_put(k, NamedSharding(mesh, spec))
    vs = jax.device_put(v, NamedSharding(mesh, spec))
    out = jax.jit(pa.flash_attention)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden_out),
                               rtol=2e-5, atol=2e-5)
    grads = jax.jit(jax.grad(_loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for g_ref, g in zip(golden_grads, grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_pp_trainer_step_with_flash_matches_plain(_force_flash):
    """Full whisper PP train step (data=2 x stage=2 GPipe schedule) with
    use_flash=True == plain step: the pallas kernel runs on the per-stage
    local activations inside the fully-manual shard_map region (no
    partitioner involvement — each stage sees unsharded [local_B, H, T, D]
    blocks), completing the flash x {TP, SP, PP} composition matrix."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from tethys_tpu.parallel import pp

    model, params, feats, labels = _tiny_whisper()
    assert model.config.use_flash_attention
    rng = jax.random.PRNGKey(7)
    opt, _, p_plain, loss_plain = _dp_sgd_step(
        model, params, feats, labels, rng, n_data=2)

    mesh = pp.make_pp_mesh(4, pipeline_parallel=2)
    state = pp.init_pp_state(params, opt, mesh, model.config)
    step = pp.make_pp_train_step(model, opt, mesh, state,
                                 num_microbatches=2, deterministic=True)
    new_state, loss_pp = step(state, (feats, labels), rng)
    np.testing.assert_allclose(float(loss_pp), float(loss_plain), rtol=1e-5)
    unpacked = pp.unpack_params(jax.device_get(new_state.params),
                                model.config.encoder_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        unpacked, jax.device_get(p_plain))


def test_remat_layers_save_flash_policy():
    """config.remat_layers + remat_policy='save_flash': the nn.remat region
    must (a) match the un-rematted model numerically with the flash kernel
    ACTIVE, and (b) actually skip the forward-kernel recompute — counted as
    custom_partitioning calls in the grad jaxpr (fwd + bwd = 2 with the
    policy; fwd + recompute-fwd + bwd = 3 without)."""
    import dataclasses

    import optax  # noqa: F401 (parity with sibling tests' imports)

    import tethys_tpu.ops.attention as attn
    from tethys_tpu.models.whisper import WhisperForConditionalGeneration
    from tethys_tpu.configs import WhisperConfig

    saved = (attn._FLASH_FORCE, attn._FLASH_MIN_SEQ)
    attn._FLASH_FORCE, attn._FLASH_MIN_SEQ = True, 16
    try:
        base = WhisperConfig(
            d_model=32, encoder_layers=1, encoder_attention_heads=2,
            decoder_layers=1, decoder_attention_heads=2, d_ff=64,
            n_mels=8, n_ctx=64, vocab_size=50, max_target_positions=16,
            decoder_start_token_id=47, use_flash_attention=True,
        )
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 8, 128)),
            jnp.float32)
        labels = jnp.asarray(
            np.random.default_rng(1).integers(3, 40, (2, 8)), jnp.int32)
        rng = jax.random.PRNGKey(0)

        grads, jaxprs = {}, {}
        for name, over in (
            ("plain", {}),
            ("save_flash", dict(remat_layers=True,
                                remat_policy="save_flash")),
            ("remat_none", dict(remat_layers=True, remat_policy="none")),
        ):
            cfg = dataclasses.replace(base, **over)
            model = WhisperForConditionalGeneration(cfg)
            params = model.init(
                {"params": rng, "dropout": rng}, feats[:1],
                labels=labels[:1], deterministic=True)["params"]

            def loss(p):
                return model.apply({"params": p}, feats, labels=labels,
                                   deterministic=True)["loss"]

            grads[name] = jax.grad(loss)(params)
            jaxprs[name] = str(jax.make_jaxpr(jax.grad(loss))(params))

        for other in ("save_flash", "remat_none"):
            for a, b in zip(jax.tree_util.tree_leaves(grads["plain"]),
                            jax.tree_util.tree_leaves(grads[other])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        n_save = jaxprs["save_flash"].count("custom_partitioning")
        n_none = jaxprs["remat_none"].count("custom_partitioning")
        assert n_save < n_none, (n_save, n_none)
    finally:
        attn._FLASH_FORCE, attn._FLASH_MIN_SEQ = saved
