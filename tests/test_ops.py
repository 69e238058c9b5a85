"""Op-level parity tests against TF goldens (gelu, GroupNorm, SAME conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.ops.activations import gelu
from tethys_tpu.ops.masks import (
    apply_feature_mask,
    apply_time_mask,
    causal_additive_mask,
)
from tethys_tpu.ops.norms import ReferenceGroupNorm
from tethys_tpu.ops.posenc import sinusoidal_table


def test_gelu_is_exact_erf():
    tf = pytest.importorskip("tensorflow")
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = (0.5 * x * (1.0 + tf.math.erf(x / np.sqrt(2.0).astype(np.float32)))
            ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_group_norm_reference_semantics():
    """Moments over (time, channels-in-group) per (batch, group) — the
    reference's hand-rolled GroupNormalization math."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 12)).astype(np.float32)
    groups = 4
    gn = ReferenceGroupNorm(groups=groups)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(gn.apply(variables, jnp.asarray(x)))

    # Golden: replicate the reshape→transpose→moments([1,2]) math in numpy.
    b, t, c = x.shape
    xg = x.reshape(b, t, groups, c // groups).transpose(0, 1, 3, 2)
    mean = xg.mean(axis=(1, 2), keepdims=True)
    var = xg.var(axis=(1, 2), keepdims=True)
    normed = (xg - mean) / np.sqrt(var + 1e-5)
    want = normed.transpose(0, 1, 3, 2).reshape(b, t, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_same_conv_matches_tf():
    """flax SAME conv (stride>1) must match tf.keras Conv1D 'same' output
    length and values — the padding arithmetic changes every downstream
    shape (SURVEY §7 hard part c)."""
    tf = pytest.importorskip("tensorflow")
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 23, 3)).astype(np.float32)
    kernel = rng.standard_normal((10, 3, 5)).astype(np.float32)  # [K, Cin, Cout]

    conv = nn.Conv(5, kernel_size=(10,), strides=(5,), padding="SAME",
                   use_bias=False)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {"params": {"kernel": jnp.asarray(kernel)}}
    got = np.asarray(conv.apply(variables, jnp.asarray(x)))

    tf_layer = tf.keras.layers.Conv1D(5, 10, strides=5, padding="same",
                                      use_bias=False)
    tf_layer.build((None, 23, 3))
    tf_layer.set_weights([kernel])
    want = tf_layer(tf.constant(x)).numpy()
    assert got.shape == want.shape == (1, 5, 5)  # ceil(23/5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grouped_conv_matches_tf():
    tf = pytest.importorskip("tensorflow")
    import flax.linen as nn

    rng = np.random.default_rng(1)
    cin = cout = 8
    groups = 4
    x = rng.standard_normal((2, 16, cin)).astype(np.float32)
    kernel = rng.standard_normal((6, cin // groups, cout)).astype(np.float32)

    conv = nn.Conv(cout, kernel_size=(6,), padding="SAME",
                   feature_group_count=groups, use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(kernel)}}
    got = np.asarray(conv.apply(variables, jnp.asarray(x)))

    tf_layer = tf.keras.layers.Conv1D(cout, 6, padding="same", groups=groups,
                                      use_bias=False)
    tf_layer.build((None, 16, cin))
    tf_layer.set_weights([kernel])
    want = tf_layer(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sinusoidal_table_values():
    pe = sinusoidal_table(16, 8)
    assert pe.shape == (16, 8)
    np.testing.assert_allclose(pe[0], np.array([0, 1] * 4, dtype=np.float32))
    div = np.exp(np.arange(0, 8, 2) * -(np.log(10000.0) / 8))
    np.testing.assert_allclose(pe[3, 0::2], np.sin(3 * div), rtol=1e-5)
    np.testing.assert_allclose(pe[3, 1::2], np.cos(3 * div), rtol=1e-5)


def test_causal_mask():
    bias = np.asarray(causal_additive_mask(4))[0, 0]
    assert bias.shape == (4, 4)
    assert np.all(bias[np.tril_indices(4)] == 0.0)
    assert np.all(bias[np.triu_indices(4, k=1)] < -1e8)


def test_specaugment_masks():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 40, 6))
    masked = np.asarray(apply_time_mask(rng, x, mask_prob=0.2, mask_length=5))
    # masked positions are whole-timestep zeros
    zero_rows = (masked == 0).all(axis=2)
    assert zero_rows.any()
    fmasked = np.asarray(
        apply_feature_mask(rng, x, mask_prob=0.5, mask_length=2)
    )
    zero_cols = (fmasked == 0).all(axis=1)
    assert zero_cols.any()


def test_group_norm_analytic_vjp_matches_autodiff():
    """Round-3: ReferenceGroupNorm's backward is a hand-written closed form
    (ops/norms._gn_core).  It must equal plain autodiff through the same
    two-pass-moments forward for dx, dgamma, dbeta."""
    import jax

    from tethys_tpu.ops.norms import _gn_core

    groups, eps = 4, 1e-5
    rng = np.random.default_rng(11)
    x = jnp.asarray(5.0 + rng.standard_normal((3, 17, 32)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(32), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(32), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((3, 17, 32)), jnp.float32)

    def ref(x, gamma, beta):
        b, t, c = x.shape
        pg = c // groups
        n = t * pg
        mu = jnp.repeat(
            jnp.sum(x, axis=1).reshape(b, groups, pg).sum(-1)[..., None]
            / n, pg, -1).reshape(b, 1, c)
        centered = x - mu
        var = jnp.repeat(
            jnp.sum(jnp.square(centered), axis=1)
            .reshape(b, groups, pg).sum(-1)[..., None] / n, pg, -1
        ).reshape(b, 1, c)
        return gamma * (centered * jax.lax.rsqrt(var + eps)) + beta

    core = _gn_core(groups, eps)
    out = core(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, gamma, beta)),
                               rtol=1e-5, atol=1e-5)

    def loss_core(args):
        return jnp.sum(core(*args) * dy)

    def loss_ref(args):
        return jnp.sum(ref(*args) * dy)

    g_core = jax.grad(loss_core)((x, gamma, beta))
    g_ref = jax.grad(loss_ref)((x, gamma, beta))
    for a, b_ in zip(g_core, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_gn_single_read_moments():
    """ops/pallas_gn.group_moments (interpret mode) must equal the jnp
    two-pass per-(batch, group) moments exactly enough for GN (1e-5)."""
    from tethys_tpu.ops import pallas_gn

    old = pallas_gn._INTERPRET
    pallas_gn._INTERPRET = True
    try:
        groups = 4
        rng = np.random.default_rng(5)
        # mean far from zero: the case where one-pass E[x^2]-mu^2 loses
        # digits; the chunked Chan combine must not.
        x = jnp.asarray(50.0 + rng.standard_normal((3, 96, 32)), jnp.float32)
        got = pallas_gn.group_moments(x, groups)
        assert got is not None
        mean_g, var_g = got

        b, t, c = x.shape
        pg = c // groups
        ref_mean = x.reshape(b, t, groups, pg).mean(axis=(1, 3))
        ref_var = jnp.square(
            x.reshape(b, t, groups, pg)
            - ref_mean[:, None, :, None]).mean(axis=(1, 3))
        np.testing.assert_allclose(np.asarray(mean_g), np.asarray(ref_mean),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var_g), np.asarray(ref_var),
                                   rtol=1e-4, atol=1e-5)
    finally:
        pallas_gn._INTERPRET = old


def test_group_norm_kernel_path_matches_jnp_path(monkeypatch):
    """The GN forward via the single-read stats kernel (interpret mode;
    opt-in knob — on-chip it measured slower, see norms._kernel_moments)
    must match the plain jnp two-pass forward."""
    import jax

    from tethys_tpu.ops import pallas_gn
    from tethys_tpu.ops.norms import ReferenceGroupNorm

    monkeypatch.setenv("TETHYS_GN_KERNEL", "1")
    rng = np.random.default_rng(6)
    x = jnp.asarray(7.0 + rng.standard_normal((4, 128, 64)), jnp.float32)
    gn = ReferenceGroupNorm(groups=8)
    params = gn.init(jax.random.PRNGKey(0), x)
    ref = gn.apply(params, x)  # CPU, not interpret: jnp path

    old = pallas_gn._INTERPRET
    pallas_gn._INTERPRET = True
    try:
        from tethys_tpu.ops import norms

        norms._gn_core.cache_clear()  # re-trace with the kernel path active
        got = gn.apply(params, x)
    finally:
        pallas_gn._INTERPRET = old
        norms._gn_core.cache_clear()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
