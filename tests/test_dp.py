"""Data-parallel runtime tests on the 8-device CPU mesh.

Validates the reference aggregation semantics (SURVEY §2.6): SUM-reduced
grads/losses for the plain step, 1/N loss scaling + per-replica clipping for
the hardened step, and DP-vs-single-device equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tethys_tpu.parallel import dp
from tethys_tpu.parallel.mesh import make_data_mesh, num_replicas


def _quadratic_loss_fn(params, batch, rng):
    del rng
    x, y = batch
    pred = x @ params["w"]
    return jnp.mean((pred - y) ** 2), {}


def _make_problem(seed=0, n=16, d=4):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((n,)).astype(np.float32)
    w0 = rng.standard_normal(d).astype(np.float32)
    # keep a numpy master copy: the device params are donated by the step
    params = {"w": jnp.asarray(w0)}
    return x, y, params, w0


def test_plain_step_sum_semantics():
    """8-way DP grads must equal the SUM of per-shard grads (MWMS apply)."""
    mesh = make_data_mesh(8)
    x, y, params, w0 = _make_problem()
    opt = optax.sgd(0.1)
    state = dp.replicate_state(dp.TrainState(params, opt.init(params)), mesh)
    step = dp.make_train_step(_quadratic_loss_fn, opt, mesh, hardened=False)

    batch = dp.shard_batch((x, y), mesh)
    new_state, loss = step(state, batch, jax.random.PRNGKey(0))

    # Golden: sum of per-shard mean losses / grads.
    losses, grads = [], []
    for i in range(8):
        xs, ys = x[i * 2:(i + 1) * 2], y[i * 2:(i + 1) * 2]
        l, g = jax.value_and_grad(
            lambda w: jnp.mean((xs @ w - ys) ** 2)
        )(jnp.asarray(w0))
        losses.append(float(l))
        grads.append(np.asarray(g))
    np.testing.assert_allclose(float(loss), np.sum(losses), rtol=1e-5)
    want_w = w0 - 0.1 * np.sum(grads, axis=0)
    np.testing.assert_allclose(
        np.asarray(new_state.params["w"]), want_w, rtol=1e-5
    )


def test_hardened_step_scaling_and_clipping():
    """Hardened step: loss/N, per-replica global-norm clip, SUM-reduce."""
    mesh = make_data_mesh(8)
    n = num_replicas(mesh)
    x, y, params, w0 = _make_problem(seed=1)
    opt = optax.sgd(1.0)
    state = dp.replicate_state(dp.TrainState(params, opt.init(params)), mesh)
    step = dp.make_train_step(_quadratic_loss_fn, opt, mesh, hardened=True)

    batch = dp.shard_batch((x, y), mesh)
    new_state, loss = step(state, batch, jax.random.PRNGKey(0))

    losses, grads = [], []
    for i in range(8):
        xs, ys = x[i * 2:(i + 1) * 2], y[i * 2:(i + 1) * 2]
        l, g = jax.value_and_grad(
            lambda w: jnp.mean((xs @ w - ys) ** 2) / n
        )(jnp.asarray(w0))
        losses.append(float(l))
        gnorm = np.linalg.norm(np.asarray(g))
        scale = min(1.0, 1.0 / gnorm) if gnorm > 0 else 1.0
        grads.append(np.asarray(g) * scale)
    np.testing.assert_allclose(float(loss), np.sum(losses), rtol=1e-5)
    want_w = w0 - np.sum(grads, axis=0)
    np.testing.assert_allclose(
        np.asarray(new_state.params["w"]), want_w, rtol=1e-4
    )


def test_nan_scrub():
    mesh = make_data_mesh(8)

    def nan_loss_fn(params, batch, rng):
        del rng
        x, _ = batch
        # NaN on every replica
        return jnp.float32(jnp.nan) * jnp.sum(x) + params["w"].sum() * 0.0, {}

    x = np.ones((8, 2), dtype=np.float32)
    params = {"w": jnp.ones((2,), dtype=jnp.float32)}
    opt = optax.sgd(0.1)
    state = dp.replicate_state(dp.TrainState(params, opt.init(params)), mesh)
    step = dp.make_train_step(nan_loss_fn, opt, mesh, hardened=True)
    _, loss = step(state, dp.shard_batch((x, x), mesh), jax.random.PRNGKey(0))
    assert float(loss) == 0.0  # scrubbed, not NaN


def test_per_variable_clipnorm():
    t = dp.per_variable_clipnorm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.3, 0.4])}
    clipped, _ = t.update(grads, t.init(grads))
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["b"]), [0.3, 0.4], rtol=1e-5)


def test_dp_equals_single_device_for_full_batch():
    """1-device mesh and 8-device mesh must produce identical params when
    the per-replica batches tile the same global batch (sanity: DP is a
    pure reformulation)."""
    x, y, params, w0 = _make_problem(seed=2)
    opt = optax.sgd(0.01)

    mesh8 = make_data_mesh(8)
    state8 = dp.replicate_state(dp.TrainState(params, opt.init(params)), mesh8)
    step8 = dp.make_train_step(_quadratic_loss_fn, opt, mesh8, hardened=False)
    out8, _ = step8(state8, dp.shard_batch((x, y), mesh8), jax.random.PRNGKey(0))

    # single "replica" computing the sum of shard-mean grads directly
    def global_loss(w):
        shard_losses = [
            jnp.mean((x[i * 2:(i + 1) * 2] @ w - y[i * 2:(i + 1) * 2]) ** 2)
            for i in range(8)
        ]
        return sum(shard_losses)

    g = jax.grad(global_loss)(jnp.asarray(w0))
    want = w0 - 0.01 * np.asarray(g)
    np.testing.assert_allclose(
        np.asarray(out8.params["w"]), want, rtol=1e-5
    )


def test_grad_accum_matches_unaccumulated():
    """grad_accum=N must be a pure memory trade for per-sample-mean losses:
    identical loss and updated params to the unaccumulated step (the
    quadratic loss ignores rng, so the fold_in-per-microbatch stream
    difference is invisible)."""
    mesh = make_data_mesh(8)
    x, y, params, w0 = _make_problem(n=32)
    opt = optax.sgd(0.1)

    results = []
    for accum in (1, 2, 4):
        state = dp.replicate_state(
            dp.TrainState({"w": jnp.asarray(w0)}, opt.init(params)), mesh)
        step = dp.make_train_step(_quadratic_loss_fn, opt, mesh,
                                  hardened=False, grad_accum=accum)
        batch = dp.shard_batch((x, y), mesh)
        new_state, loss = step(state, batch, jax.random.PRNGKey(0))
        results.append((float(loss), np.asarray(new_state.params["w"])))

    for loss, w in results[1:]:
        np.testing.assert_allclose(loss, results[0][0], rtol=1e-5)
        np.testing.assert_allclose(w, results[0][1], rtol=1e-5)


def test_grad_accum_hardened_matches_unaccumulated():
    """Hardened chain under accumulation: NaN scrub per microbatch, 1/N
    scale, ONE per-replica clip on the accumulated grads — equals the
    unaccumulated hardened step on clean data."""
    mesh = make_data_mesh(8)
    x, y, params, w0 = _make_problem(n=32)
    opt = optax.adam(1e-3)

    results = []
    for accum in (1, 4):
        state = dp.replicate_state(
            dp.TrainState({"w": jnp.asarray(w0)}, opt.init(params)), mesh)
        step = dp.make_train_step(_quadratic_loss_fn, opt, mesh,
                                  hardened=True, grad_accum=accum)
        batch = dp.shard_batch((x, y), mesh)
        new_state, loss = step(state, batch, jax.random.PRNGKey(0))
        results.append((float(loss), np.asarray(new_state.params["w"])))

    np.testing.assert_allclose(results[1][0], results[0][0], rtol=1e-5)
    np.testing.assert_allclose(results[1][1], results[0][1], rtol=1e-5)


def test_grad_accum_rejects_indivisible_batch():
    mesh = make_data_mesh(8)
    x, y, params, w0 = _make_problem(n=24)  # 3 per replica, accum 2
    opt = optax.sgd(0.1)
    state = dp.replicate_state(dp.TrainState(params, opt.init(params)), mesh)
    step = dp.make_train_step(_quadratic_loss_fn, opt, mesh, grad_accum=2)
    batch = dp.shard_batch((x, y), mesh)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.PRNGKey(0))


def test_scan_grad_accum_accumulates_in_f32_under_bf16_params():
    """bf16 master params must not round the microbatch gradient sum (the
    running bf16 sum loses adds below its ~8-bit mantissa — code-review
    finding, round 4).  Chunk grads [256, 1, 1, ..., 1]: a bf16 accumulator
    absorbs every +1 into 256; the f32 accumulator must not."""
    from tethys_tpu.parallel.dp import scan_grad_accum

    params = {"w": jnp.zeros((1,), jnp.bfloat16)}
    batch = jnp.arange(8, dtype=jnp.float32)[:, None]  # lead dim 8

    def vg_fn(p, mb, rng):
        g = jnp.where(mb[0, 0] == 0, 256.0, 1.0).astype(jnp.bfloat16)
        return (jnp.float32(0.0), {}), {"w": g[None]}

    loss, grads, _ = scan_grad_accum(vg_fn, params, batch,
                                     jax.random.PRNGKey(0), grad_accum=8)
    # f32 sum = 263, mean = 32.875 -> bf16 result 32.75; a bf16 running sum
    # would have produced 256 / 8 = 32.0 exactly.
    assert grads["w"].dtype == jnp.bfloat16
    assert float(grads["w"][0]) > 32.5
