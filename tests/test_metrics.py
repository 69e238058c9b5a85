"""Metrics accumulator tests."""

import jax.numpy as jnp
import numpy as np

from tethys_tpu.metrics import Mean, SparseCategoricalAccuracy, token_accuracy


def test_mean():
    m = Mean()
    m.update_state(2.0)
    m.update_state(4.0)
    assert m.result() == 3.0
    m.reset_state()
    assert m.result() == 0.0


def test_sparse_categorical_accuracy():
    acc = SparseCategoricalAccuracy()
    logits = jnp.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    labels = jnp.asarray([1, 0, 0])
    acc.update_state(labels, logits)
    assert acc.result() == 2 / 3


def test_token_accuracy_shifted():
    logits = jnp.zeros((1, 4, 3)).at[0, :, 2].set(1.0)  # predicts 2 always
    labels = jnp.asarray([[9, 2, 2, 1]])  # shifted targets: [2, 2, 1]
    correct, total = token_accuracy(logits, labels)
    assert int(correct) == 2 and int(total) == 3
