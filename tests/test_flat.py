"""Flat-buffer optimizer path (parallel/flat.py) vs the pytree path.

The flat path must be a pure reformulation: for the same loss_fn, optimizer
config, and batches, the flat step and the pytree step must produce the
same losses and parameters (up to f32 reduction-order noise) for both
family optimizer configs, plain and hardened.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tethys_tpu.parallel import dp, flat
from tethys_tpu.parallel.mesh import make_data_mesh


def _mlp_params(seed=0):
    """A small heterogeneous pytree: matrices, vectors, a scalar-ish leaf."""
    rng = np.random.default_rng(seed)
    return {
        "dense1": {"kernel": jnp.asarray(
            rng.standard_normal((7, 33)), dtype=jnp.float32),
            "bias": jnp.zeros((33,), jnp.float32)},
        "dense2": {"kernel": jnp.asarray(
            rng.standard_normal((33, 3)), dtype=jnp.float32),
            "bias": jnp.zeros((3,), jnp.float32)},
        "scale": jnp.asarray([1.5], dtype=jnp.float32),
    }


def _mlp_loss(params, batch, rng):
    del rng
    x, y = batch
    h = jnp.tanh(x @ params["dense1"]["kernel"] + params["dense1"]["bias"])
    pred = (h @ params["dense2"]["kernel"] + params["dense2"]["bias"])
    pred = pred * params["scale"]
    return jnp.mean((pred - y) ** 2), {}


def _batch(seed=0, n=16):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 7)).astype(np.float32),
            rng.standard_normal((n, 3)).astype(np.float32))


def test_flatten_unflatten_roundtrip():
    params = _mlp_params()
    spec = flat.FlatSpec(params)
    vec = spec.flatten(params)
    assert vec.shape == (spec.total,)
    assert spec.total % flat.CHUNK == 0
    back = spec.unflatten(vec)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


def test_unflatten_vjp_is_single_concat():
    """grad through unflatten must equal the flattened cotangents."""
    params = _mlp_params()
    spec = flat.FlatSpec(params)
    vec = spec.flatten(params)

    def f(v):
        tree = spec.unflatten(v)
        return (jnp.sum(tree["dense1"]["kernel"] ** 2)
                + 3.0 * jnp.sum(tree["scale"]))

    g = jax.grad(f)(vec)
    want_tree = jax.grad(
        lambda p: jnp.sum(p["dense1"]["kernel"] ** 2)
        + 3.0 * jnp.sum(p["scale"]))(params)
    want = spec.flatten(want_tree)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-6)


def test_per_variable_sumsq_matches_tree():
    params = _mlp_params(seed=3)
    spec = flat.FlatSpec(params)
    vec = spec.flatten(params)
    got = np.asarray(spec.per_variable_sumsq(vec))
    want = [float(jnp.sum(jnp.square(l)))
            for l in jax.tree_util.tree_leaves(params)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_flat_clipnorm_matches_pytree_clipnorm():
    params = _mlp_params(seed=4)
    spec = flat.FlatSpec(params)
    vec = spec.flatten(params)
    t_flat = flat.per_variable_clipnorm(spec, 1.0)
    t_tree = dp.per_variable_clipnorm(1.0)
    got, _ = t_flat.update(vec, t_flat.init(vec))
    want, _ = t_tree.update(params, t_tree.init(params))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(spec.flatten(want)), rtol=1e-5)


def _run_steps(step, state, batches, rng):
    losses = []
    for i, b in enumerate(batches):
        state, loss = step(state, b, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    return state, losses


def _compare_paths(hardened: bool, family: str, n_devices: int = 8):
    mesh = make_data_mesh(n_devices)
    params = _mlp_params(seed=5)
    rng = jax.random.PRNGKey(0)
    batches = [dp.shard_batch(_batch(seed=i), mesh) for i in range(3)]

    # pytree path
    opt_tree = (dp.wav2vec2_optimizer(3e-2) if family == "wav2vec2"
                else dp.whisper_optimizer(1e-2))
    state_tree = dp.replicate_state(
        dp.TrainState(params, opt_tree.init(params)), mesh)
    step_tree = dp.make_train_step(_mlp_loss, opt_tree, mesh,
                                   hardened=hardened)
    state_tree, losses_tree = _run_steps(step_tree, state_tree, batches, rng)

    # flat path (fresh params: the pytree step donated the originals)
    params = _mlp_params(seed=5)
    spec = flat.FlatSpec(params)
    lr = 3e-2 if family == "wav2vec2" else 1e-2
    opt_flat = flat.flat_optimizer(spec, family, lr)
    vec = spec.flatten(params)
    state_flat = dp.replicate_state(
        dp.TrainState(vec, opt_flat.init(vec)), mesh)
    step_flat = dp.make_train_step(_mlp_loss, opt_flat, mesh,
                                   hardened=hardened, flat_spec=spec)
    state_flat, losses_flat = _run_steps(step_flat, state_flat, batches, rng)

    np.testing.assert_allclose(losses_flat, losses_tree, rtol=1e-5)
    final_tree = jax.device_get(state_tree.params)
    final_flat = spec.unflatten(jax.device_get(state_flat.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        final_tree, final_flat)


def test_flat_equals_pytree_whisper_plain():
    _compare_paths(hardened=False, family="whisper")


def test_flat_equals_pytree_wav2vec2_hardened():
    _compare_paths(hardened=True, family="wav2vec2")


def test_flat_grad_aux_fn_receives_pytree():
    mesh = make_data_mesh(4)
    params = _mlp_params(seed=6)
    spec = flat.FlatSpec(params)
    opt = flat.whisper_optimizer(1e-2)
    vec = spec.flatten(params)
    state = dp.replicate_state(dp.TrainState(vec, opt.init(vec)), mesh)

    seen = {}

    def grad_aux(grads):
        seen["structure"] = jax.tree_util.tree_structure(grads)
        return {"gnorm_d1": jnp.sqrt(
            jnp.sum(jnp.square(grads["dense1"]["kernel"])))}

    step = dp.make_train_step(_mlp_loss, opt, mesh, flat_spec=spec,
                              return_aux=True, grad_aux_fn=grad_aux)
    batch = dp.shard_batch(_batch(seed=9, n=8), mesh)
    _, loss, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "grad_aux" in aux and "gnorm_d1" in aux["grad_aux"]
    assert seen["structure"] == jax.tree_util.tree_structure(params)
