"""Loss semantics tests, incl. TF-golden CTC parity (tf runs on CPU here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tethys_tpu import losses


def test_seq2seq_shifted_ce_masked():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 6, 11), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 11, (2, 6)), dtype=jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]],
                       dtype=jnp.float32)

    plain = float(losses.seq2seq_shifted_ce(logits, labels))
    masked = float(losses.seq2seq_shifted_ce(logits, labels, mask))

    lg = np.asarray(logits, dtype=np.float64)[:, :-1]
    lb = np.asarray(labels)[:, 1:]
    ce = np.log(np.exp(lg).sum(-1)) - np.take_along_axis(
        lg, lb[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(plain, ce.mean(), rtol=1e-5)
    m = np.asarray(mask)[:, :-1]
    np.testing.assert_allclose(masked, (ce * m).sum() / m.sum(), rtol=1e-5)


def test_negative_sampler_shapes_and_tiling():
    rng = jax.random.PRNGKey(0)
    idx = losses.sample_negative_indices(rng, 3, 50, 10)
    assert idx.shape == (3, 50, 10)
    # identical negative set per timestep (reference tiling semantics)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.asarray(idx[:, 17]))
    assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 50)

    # short sequence: T-1 < K → clamp + repeat-tile up to K
    idx_short = losses.sample_negative_indices(rng, 2, 4, 10)
    assert idx_short.shape == (2, 4, 10)
    first3 = np.asarray(idx_short[:, 0, :3])
    np.testing.assert_array_equal(np.asarray(idx_short[:, 0, 3:6]), first3)


def test_contrastive_loss_prefers_positive():
    """When h == q and negatives differ, loss must be < uniform CE."""
    rng = np.random.default_rng(0)
    h = rng.standard_normal((2, 20, 8)).astype(np.float32)
    logits, loss = losses.contrastive_loss(
        jnp.asarray(h), jnp.asarray(h), jax.random.PRNGKey(1),
        num_negatives=5, temperature=0.1,
    )
    assert logits.shape == (2, 20, 6)
    assert float(loss) < np.log(6)


def test_diversity_loss_sign():
    # Reference quirk: diversity loss is plain -perplexity.
    assert float(losses.diversity_loss(jnp.float32(7.5))) == -7.5


def test_ctc_loss_matches_tensorflow():
    """Golden parity against tf.nn.ctc_loss (blank=0, time-major)."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    b, t, v = 2, 12, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array([[2, 3, 4, 0, 0], [1, 2, 0, 0, 0]], dtype=np.int32)

    got = losses.ctc_loss(
        jnp.asarray(logits), jnp.asarray(labels), reduction="none"
    )

    label_lengths = (labels > 0).sum(axis=1).astype(np.int32)
    logit_lengths = np.full((b,), t, dtype=np.int32)
    want = tf.nn.ctc_loss(
        labels=tf.constant(labels),
        logits=tf.constant(np.transpose(logits, (1, 0, 2))),
        label_length=tf.constant(label_lengths),
        logit_length=tf.constant(logit_lengths),
        blank_index=0,
        logits_time_major=True,
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    got_sum = float(losses.ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                                    reduction="sum"))
    np.testing.assert_allclose(got_sum, want.sum(), rtol=1e-4)
    got_mean = float(losses.ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     reduction="mean"))
    np.testing.assert_allclose(got_mean, want.mean(), rtol=1e-4)


def test_dummy_ctc_loss_is_ce_vs_zeros():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 7)).astype(np.float32)
    got = float(losses.dummy_ctc_loss(jnp.asarray(logits)))
    lg = logits.astype(np.float64)
    ce = np.log(np.exp(lg).sum(-1)) - lg[..., 0]
    np.testing.assert_allclose(got, ce.mean(), rtol=1e-5)


def test_contrastive_matmul_equals_broadcast_form():
    """The einsum formulation must equal the reference's broadcast-gather
    form exactly (negatives are shared across time)."""
    rng = np.random.default_rng(3)
    h = rng.standard_normal((2, 12, 8)).astype(np.float32)
    q = rng.standard_normal((2, 12, 8)).astype(np.float32)
    key = jax.random.PRNGKey(9)
    logits, loss = losses.contrastive_loss(
        jnp.asarray(h), jnp.asarray(q), key, num_negatives=5, temperature=0.1)

    # golden: reference broadcast form in numpy
    idx = np.asarray(losses.sample_negative_indices(key, 2, 12, 5))
    pos = (h * q).sum(-1) / 0.1
    neg_q = np.stack([q[b][idx[b]] for b in range(2)])  # [B, T, K, D]
    neg = (h[:, :, None, :] * neg_q).sum(-1) / 0.1
    want = np.concatenate([pos[:, :, None], neg], axis=2)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4, atol=1e-5)
