"""tethys_tpu — a TPU-native JAX speech-training framework.

Re-implements the capabilities of the reference `hyunnnchoi/tethys-speech`
(TensorFlow-2 Whisper / Wav2Vec2 scheduler-evaluation training jobs) as one
shared library designed TPU-first:

* models are pure flax.linen modules compiled by XLA (static shapes, bf16
  MXU-friendly matmuls),
* data parallelism is `jit` + `shard_map` over a `jax.sharding.Mesh` with
  `psum` collectives riding ICI (replacing tf.distribute
  MultiWorkerMirroredStrategy ring all-reduce, see reference
  speech_jobs/whisper_dist.py:1047),
* the audio frontend and hot attention path have fused Pallas kernels,
* job CLIs, per-step log lines, JCT/result-file layout and checkpoint
  cadence keep the reference's contracts so jobs remain drop-in
  scheduler-evaluation workloads.
"""

__version__ = "0.1.0"

from tethys_tpu.configs import WhisperConfig, Wav2Vec2Config  # noqa: F401
