"""Head split/merge pallas kernels (ops/pallas_transpose.py).

Interpret-mode equality against the jnp reshape+transpose reference, at
whisper-base shapes (whole-T tile) AND whisper-medium/large shapes where the
padded whole-T tile exceeds the scoped-VMEM budget and the kernel must grid
over T (the round-3 medium bench OOM'd at 18 MB vs XLA's 16 MB limit before
T-splitting existed).  Also pins the VJPs (inverse permutes) and the
_choose_t_block budget math itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu.ops import pallas_transpose as pt


def _ref_split(x, num_heads):
    b, t, d_model = x.shape
    head_dim = d_model // num_heads
    return x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)


def _ref_merge(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# (t, num_heads, head_dim) — base whole-T; medium and large force a T-split
# in bf16 (padded out tiles 2x the nominal size); an awkward non-pow2 T.
SHAPES = [(1536, 8, 64), (1536, 16, 64), (1536, 20, 64), (96, 4, 32)]


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pt, "_INTERPRET", True)
    monkeypatch.setattr(pt, "SPLIT_IMPL", "pallas")
    monkeypatch.setattr(pt, "MERGE_IMPL", "pallas")


@pytest.mark.parametrize("t,h,d", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_split_merge_match_reference(t, h, d, dtype):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, t, h * d)), dtype=dtype)
    got = pt.split_heads(x, h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref_split(x, h)))
    back = pt.merge_heads(got)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_medium_shape_splits_t_grid():
    # bf16 medium [1536, 1024]: nominal in+out = 6.3 MB but the per-head
    # [T, 64] slabs pad to 128 lanes -> 9.4 MB padded > budget; the chosen
    # block must subdivide T yet stay sublane-aligned (16 for bf16).
    blk = pt._choose_t_block(1536, 16, 64, jnp.bfloat16)
    assert blk is not None and blk < 1536
    assert 1536 % blk == 0 and blk % 16 == 0
    assert pt._tile_bytes(blk, 16, 64, jnp.bfloat16) <= pt._MAX_TILE_BYTES


def test_base_shape_keeps_whole_t():
    assert pt._choose_t_block(1536, 8, 64, jnp.bfloat16) == 1536


def test_no_legal_block_falls_back_to_xla():
    # T with no sublane-aligned divisor (prime) AND an over-budget tile:
    # the public entry points must silently take the jnp path.
    t, h, d = 977, 32, 128  # f32 [977, 4096] tile is ~32 MB padded
    assert pt._choose_t_block(t, h, d, jnp.float32) is None
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, t, h * d)),
        dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pt.split_heads(x, h)), np.asarray(_ref_split(x, h)))


@pytest.mark.parametrize("t,h,d", [(1536, 16, 64), (1536, 8, 64)])
def test_vjps_are_inverse_permutes(t, h, d):
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, t, h * d)),
        dtype=jnp.float32)
    dy = _ref_split(x, h)

    _, vjp_split = jax.vjp(lambda a: pt.split_heads(a, h), x)
    (dx,) = vjp_split(dy)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(_ref_merge(dy)))

    y = _ref_split(x, h)
    _, vjp_merge = jax.vjp(pt.merge_heads, y)
    (dyy,) = vjp_merge(x)
    np.testing.assert_array_equal(np.asarray(dyy), np.asarray(_ref_split(x, h)))
