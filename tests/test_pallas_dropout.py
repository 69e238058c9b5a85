"""Fused dropout op tests (interpreter mode can't run the TPU PRNG, so CPU
tests cover the fallback path + shape plumbing; statistics and bwd-mask
identity were validated on-device)."""

import jax
import jax.numpy as jnp
import numpy as np

from tethys_tpu.ops.pallas_dropout import fused_dropout, module_dropout


def test_rate_zero_identity():
    x = jnp.ones((4, 7, 5))
    out = fused_dropout(x, 0.0, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_module_dropout_fallback_cpu():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            return module_dropout(self, x, 0.5, deterministic)

    m = M()
    x = jnp.ones((8, 16))
    rng = jax.random.PRNGKey(0)
    out_det = m.apply({}, x, True, rngs={"dropout": rng})
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(x))
    out = m.apply({}, x, False, rngs={"dropout": rng})
    vals = np.unique(np.asarray(out))
    assert set(vals.tolist()) <= {0.0, 2.0}  # dropped or scaled by 1/(1-p)
    assert (np.asarray(out) == 0).any()
