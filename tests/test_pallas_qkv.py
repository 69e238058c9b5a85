"""Fused projection+split / merge+projection kernels (ops/pallas_qkv.py).

Interpret-mode equality against the unfused Dense-semantics reference
((x @ K + b) * s then head-split; merge then @ K_o + b_o), forward AND
grads through the custom VJPs, at whisper-base-like shapes plus an
awkward small shape.  Also pins the supported() gating (off-TPU → False
outside interpret mode is covered by the default path in the model tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.ops import pallas_qkv as pq


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pq, "_INTERPRET", True)
    # The fused path is opt-in (measured slower than the default dot +
    # split_heads path at whisper shapes — BASELINE.md round 4).
    monkeypatch.setenv("TETHYS_FUSED_QKV", "1")


def _ref_project_split(x, projections, num_heads):
    outs = []
    for kern, bias, scale in projections:
        y = (jnp.dot(x, kern.astype(x.dtype)) + bias.astype(x.dtype)) * scale
        b, t, e = y.shape
        outs.append(y.reshape(b, t, num_heads, e // num_heads)
                    .transpose(0, 2, 1, 3))
    return tuple(outs)


def _ref_merge_project(attn, kernel, bias):
    b, h, t, d = attn.shape
    merged = attn.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    return jnp.dot(merged, kernel.astype(attn.dtype)) + bias.astype(attn.dtype)


def _make(rng, b, t, e, num_heads, n_mats, dtype):
    keys = jax.random.split(rng, 1 + 2 * n_mats)
    x = jax.random.normal(keys[0], (b, t, e), dtype)
    projections = []
    for m in range(n_mats):
        kern = jax.random.normal(keys[1 + 2 * m], (e, e), jnp.float32) * 0.05
        bias = jax.random.normal(keys[2 + 2 * m], (e,), jnp.float32) * 0.1
        scale = 0.125 if m == 0 else 1.0
        projections.append((kern, bias, scale))
    return x, projections


@pytest.mark.parametrize("t,num_heads", [(256, 8), (96, 4)])
def test_project_split_matches_reference(t, num_heads):
    x, projections = _make(jax.random.PRNGKey(0), 2, t, 128, num_heads,
                           3, jnp.float32)
    got = pq.project_split(x, projections, num_heads)
    want = _ref_project_split(x, projections, num_heads)
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_project_split_bf16():
    x, projections = _make(jax.random.PRNGKey(1), 1, 128, 128, 4,
                           2, jnp.bfloat16)
    got = pq.project_split(x, projections, 4)
    want = _ref_project_split(x, projections, 4)
    for g, w in zip(got, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_project_split_grads_match_reference():
    x, projections = _make(jax.random.PRNGKey(2), 2, 64, 64, 4,
                           3, jnp.float32)
    kernels = tuple(p[0] for p in projections)
    biases = tuple(p[1] for p in projections)
    scales = tuple(p[2] for p in projections)  # static — not differentiated

    def loss(fn, x, kernels, biases):
        projs = list(zip(kernels, biases, scales))
        outs = fn(x, projs, 4)
        return sum(jnp.sum(o * (i + 1.0)) for i, o in enumerate(outs))

    gf = jax.grad(lambda *a: loss(pq.project_split, *a),
                  argnums=(0, 1, 2))(x, kernels, biases)
    gr = jax.grad(lambda *a: loss(_ref_project_split, *a),
                  argnums=(0, 1, 2))(x, kernels, biases)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gf, gr)


@pytest.mark.parametrize("t,num_heads", [(256, 8), (96, 4)])
def test_merge_project_matches_reference(t, num_heads):
    rng = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(rng, 3)
    attn = jax.random.normal(k1, (2, num_heads, t, 32), jnp.float32)
    kernel = jax.random.normal(k2, (num_heads * 32, 128), jnp.float32) * 0.05
    bias = jax.random.normal(k3, (128,), jnp.float32) * 0.1
    got = pq.merge_project(attn, kernel, bias)
    want = _ref_merge_project(attn, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_merge_project_grads_match_reference():
    rng = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(rng, 3)
    attn = jax.random.normal(k1, (2, 4, 64, 16), jnp.float32)
    kernel = jax.random.normal(k2, (64, 96), jnp.float32) * 0.05
    bias = jax.random.normal(k3, (96,), jnp.float32) * 0.1

    gf = jax.grad(lambda a, k, b: jnp.sum(
        pq.merge_project(a, k, b) ** 2), argnums=(0, 1, 2))(
            attn, kernel, bias)
    gr = jax.grad(lambda a, k, b: jnp.sum(
        _ref_merge_project(a, k, b) ** 2), argnums=(0, 1, 2))(
            attn, kernel, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_supported_gating():
    # indivisible heads
    assert not pq.supported(128, 128, 130, 4, 3, jnp.float32)
    # whisper-base shapes fit whole-T with all three matrices resident
    assert pq.supported(1536, 512, 512, 8, 3, jnp.bfloat16)
    # large-E weights exceed the 3-matrix budget but fit one-at-a-time
    # (project_split then takes the per-matrix tier)
    assert pq.supported(1536, 1280, 1280, 20, 1, jnp.bfloat16)


def test_project_split_t_split_path():
    """Force the gridded-T path (tile budget exceeded at whole T)."""
    x, projections = _make(jax.random.PRNGKey(5), 1, 512, 256, 8,
                           3, jnp.float32)
    orig = pq._MAX_TILE_BYTES
    try:
        pq._MAX_TILE_BYTES = 1 * 1024 * 1024
        t_blk = pq._choose_t_block(512, 256, 256, 8, 3, jnp.float32)
        assert t_blk is not None and t_blk < 512
        got = pq.project_split(x, projections, 8)
    finally:
        pq._MAX_TILE_BYTES = orig
    want = _ref_project_split(x, projections, 8)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)
