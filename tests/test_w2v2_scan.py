"""Scan-over-layers wav2vec2 encoder (cfg.scan_layers): the [L, ...]-stacked
nn.scan layout must be a pure re-layout of the unrolled one — identical
losses/grads under jit with structurally converted params — so the TF-parity
chain (reference == unrolled == scanned) holds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.configs import Wav2Vec2Config
from tethys_tpu.models.wav2vec2 import (
    Wav2Vec2Encoder,
    create_full_model,
    pretraining_loss,
    stack_layer_params,
    unstack_layer_params,
)


def _models():
    m_u, cfg = create_full_model("pretraining", "tiny")
    m_s, _ = create_full_model("pretraining", "tiny", scan_layers=True)
    rng = jax.random.PRNGKey(0)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
    params = m_u.init({"params": rng, "dropout": rng}, audio,
                      training=True, deterministic=True)["params"]
    return m_u, m_s, cfg, params, audio


def test_scan_matches_unrolled_under_jit():
    """Same loss and same grads (mapped back through unstack) under jit.
    NOTE: eager (op-by-op) execution may differ at ~1e-3 from jit fusion
    reassociation; under jit the two layouts are bitwise identical."""
    m_u, m_s, cfg, p_u, audio = _models()
    p_s = stack_layer_params(p_u)
    rng = jax.random.PRNGKey(3)

    def make_loss(model):
        def loss(p):
            outputs = model.apply({"params": p}, audio, training=True,
                                  deterministic=True)
            l, _ = pretraining_loss(cfg, outputs, rng)
            return l
        return loss

    loss_u, grads_u = jax.jit(jax.value_and_grad(make_loss(m_u)))(p_u)
    loss_s, grads_s = jax.jit(jax.value_and_grad(make_loss(m_s)))(p_s)
    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-6)
    # Grad tolerance: the scan accumulates dW per iteration while the
    # unrolled graph sums in XLA's own order — f32 reassociation noise.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        unstack_layer_params(jax.device_get(grads_s)),
        jax.device_get(grads_u))


def test_stack_unstack_roundtrip():
    m_u, m_s, _, p_u, audio = _models()
    p_rt = unstack_layer_params(stack_layer_params(p_u))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_u, p_rt)


def test_scan_init_structure_matches_stacked():
    """m_s.init builds the same tree structure/shapes as stacking m_u's."""
    m_u, m_s, _, p_u, audio = _models()
    p_s = stack_layer_params(p_u)
    rng = jax.random.PRNGKey(0)
    p_s2 = m_s.init({"params": rng, "dropout": rng}, audio,
                    training=True, deterministic=True)["params"]
    flat1 = jax.tree_util.tree_flatten_with_path(p_s)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p_s2)[0]
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat1] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat2]


def test_weighted_layer_sum_scan_matches_unrolled():
    cfg_u = Wav2Vec2Config.from_size("tiny", use_weighted_layer_sum=True)
    cfg_s = Wav2Vec2Config.from_size("tiny", use_weighted_layer_sum=True,
                                     scan_layers=True)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 50, cfg_u.hidden_size)),
        jnp.float32)
    p_u = Wav2Vec2Encoder(cfg_u).init(jax.random.PRNGKey(0), x,
                                      deterministic=True)["params"]
    p_s = stack_layer_params({"encoder": p_u})["encoder"]
    # Eager comparison: op-by-op execution is bitwise identical between the
    # layouts (jit outputs of EITHER layout can drift ~1e-2 from eager on
    # this random-init f32 CPU model — XLA fusion reassociation through
    # LayerNorm amplification, not a layout effect).
    o_u = Wav2Vec2Encoder(cfg_u).apply(
        {"params": p_u}, x, deterministic=True)["last_hidden_state"]
    o_s = Wav2Vec2Encoder(cfg_s).apply(
        {"params": p_s}, x, deterministic=True)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_u),
                               rtol=1e-3, atol=1e-5)


def test_tp_shardings_cover_stacked_layout():
    """tp._spec_for prepends the stack dim for scan params: stacked dense
    kernels get P(None, None, 'model') etc., so TP composes with scan."""
    from jax.sharding import PartitionSpec as P

    from tethys_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    m_u, m_s, _, p_u, _ = _models()
    p_s = stack_layer_params(p_u)
    mesh = tp.make_2d_mesh(8, model_parallel=2)
    shardings = tp.param_shardings(p_s, mesh)
    layers = shardings["wav2vec2"]["encoder"]["layers"]
    assert layers["attention"]["q_proj"]["kernel"].spec == \
        P(None, None, "model")
    assert layers["attention"]["q_proj"]["bias"].spec == P(None, "model")
    assert layers["attention"]["out_proj"]["kernel"].spec == \
        P(None, "model", None)
    assert layers["feed_forward"]["intermediate_dense"]["kernel"].spec == \
        P(None, None, "model")
    # Norm scales stay replicated.
    assert layers["attention_layer_norm"]["scale"].spec == P()
    # Unstacked params keep their round-2 specs (regression guard).
    u_shardings = tp.param_shardings(p_u, mesh)
    assert u_shardings["wav2vec2"]["encoder"]["layers_0"]["attention"][
        "q_proj"]["kernel"].spec == P(None, "model")
