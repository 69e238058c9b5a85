"""Two-process DP JOB worker: the full train_wav2vec2 entry point (the
reference's primary dist workload) across process boundaries.

Covers the multi-host path of the most-used jobs glue: TF_CONFIG ->
initialize_distributed() -> make_data_mesh over 2 single-device processes
-> per-process local batch feeding -> two hardened DP steps (NaN scrub,
1/N, per-replica clip, SUM-of-replica-losses over gloo) -> final state on
every process.  Exercises the host_cpu_context fix (jax.local_devices —
with the old global-list lookup the worker process would segfault in its
first traced model.init).

Each process prints `MP_DPJOB_OK process=<i> losses=<l0>,<l1>`; the parent
asserts both report identical, finite losses.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tethys_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(timeout_s=60)
    import numpy as np

    from tethys_tpu.train import jobs

    assert jax.process_count() == 2, jax.process_count()
    result, _, _ = jobs.train_wav2vec2(
        model_type="pretraining",
        model_size="tiny",
        batch_size_per_replica=2,
        num_batches=2,
        checkpointing=False,
        audio_length=4000,
        config_overrides=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64,
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
            num_codevectors_per_group=12, num_codevector_groups=2,
            codevector_dim=16, proj_codevector_dim=16, num_negatives=6,
        ),
    )
    assert result.total_steps == 2
    assert all(np.isfinite(result.losses)), result.losses
    losses = ",".join(f"{l:.6f}" for l in result.losses)
    print(f"MP_DPJOB_OK process={jax.process_index()} losses={losses}",
          flush=True)


if __name__ == "__main__":
    main()
