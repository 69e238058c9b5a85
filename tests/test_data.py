"""Dummy dataset semantics tests."""

import numpy as np

from tethys_tpu.data import (
    create_whisper_dummy_dataset,
    create_wav2vec2_dummy_dataset,
)


def test_whisper_dataset_shapes_and_labels():
    ds = create_whisper_dummy_dataset(batch_size=8)
    it = iter(ds)
    feats, labels = next(it)
    assert feats.shape == (8, 80, 3000) and feats.dtype == np.float32
    assert labels.shape == (8, 100) and labels.dtype == np.int32
    assert np.all(labels[:, 0] == 1)  # BOS
    for row in labels:
        eos_positions = np.where(row == 2)[0]
        assert len(eos_positions) >= 1
        last = eos_positions[-1]
        assert 49 <= last <= 88  # length-1 for length in [50, 90)
        assert np.all(row[last + 1:] == 0)  # zero padding after EOS


def test_whisper_dataset_repeats_with_padded_tail():
    ds = create_whisper_dummy_dataset(batch_size=8, num_samples=50)
    it = iter(ds)
    batches = [next(it) for _ in range(14)]  # two passes: 7 batches each
    for f, l in batches:
        assert f.shape[0] == 8  # static shapes incl. padded tail batch
    # pass 2 starts identical to pass 1 (repeat semantics)
    np.testing.assert_array_equal(batches[0][0], batches[7][0])


def test_wav2vec2_dataset_drop_remainder():
    ds = create_wav2vec2_dummy_dataset(batch_size=8, num_samples=50)
    it = iter(ds)
    first_pass = [next(it) for _ in range(6)]  # 50 // 8 = 6 full batches
    audio, labels = first_pass[0]
    assert audio.shape == (8, 32000) and audio.dtype == np.float32
    assert labels.shape == (8,) and np.all(labels == 0.0)
    # 7th batch restarts the pass (remainder dropped)
    seventh = next(it)
    np.testing.assert_array_equal(seventh[0], first_pass[0][0])


def test_wav2vec2_dataset_5s_variant():
    ds = create_wav2vec2_dummy_dataset(batch_size=2, audio_length=80000)
    audio, _ = next(iter(ds))
    assert audio.shape == (2, 80000)
