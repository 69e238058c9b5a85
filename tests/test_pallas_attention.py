"""Flash attention kernel tests (CPU interpreter mode).

Dropout paths use the TPU hardware PRNG which has no CPU lowering; those are
exercised on-device by bench runs and were validated with exact adjoint
consistency (see kernel module docstring).  Here we verify the no-dropout
math (values + grads) against the XLA reference, including padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tethys_tpu.ops.pallas_attention as pa


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pa._INTERPRET
    pa._INTERPRET = True
    yield
    pa._INTERPRET = old


def _ref_attention(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("t", [128, 200, 384])
def test_forward_matches_xla(t):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, t, 64)), dtype=jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((1, 2, t, 64)), dtype=jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((1, 2, t, 64)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pa.flash_attention(q, k, v)),
        np.asarray(_ref_attention(q, k, v)),
        rtol=2e-5, atol=2e-5,
    )


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    shape = (1, 2, 200, 64)  # 200 exercises the padded tail
    q = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)

    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(_ref_attention(q, k, v))),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_flash = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(pa.flash_attention(q, k, v))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gr, gf in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=1e-4, atol=1e-5)


def test_cross_attention_shapes():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 2, 384, 64)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 640, 64)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 640, 64)), dtype=jnp.float32)
    out = pa.flash_attention(q * 0.2, k * 0.2, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_attention(q * 0.2, k * 0.2, v)),
        rtol=2e-5, atol=2e-5,
    )


def test_supported_gate():
    q = jnp.zeros((1, 2, 512, 64))
    assert pa.supported(q, q, q, None)
    assert not pa.supported(q, q, q, jnp.zeros((1, 1, 512, 512)))
    q_big = jnp.zeros((1, 2, 512, 256))
    assert not pa.supported(q_big, q_big, q_big, None)


def test_block_sizes():
    assert pa._block_sizes(1536, 1536) == (512, 1536)
    assert pa._block_sizes(128, 128) == (128, 128)
    assert pa._block_sizes(4096, 4096) == (512, 2048)
