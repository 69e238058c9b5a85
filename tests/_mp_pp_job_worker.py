"""Four-process PIPELINE-PARALLEL JOB worker: the full train_whisper entry
point (not just the pp API) across process boundaries.

Covers the whole multi-host --pp job path end to end: TF_CONFIG ->
initialize_distributed() -> make_pp_mesh over 4 single-device processes
(data=2 x stage=2) -> per-process local batch feeding via dp.shard_batch ->
two GPipe train steps -> the finalization gather (pp.gather_unpacked_params
— the round-3 self-review fix: a bare device_get raises here because other
stages' shards are non-addressable).

Each process prints `MP_PPJOB_OK process=<i> losses=<l0>,<l1>`; the parent
asserts all four report identical, finite losses.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = dict(
    d_model=32, encoder_layers=2, encoder_attention_heads=2,
    decoder_layers=1, decoder_attention_heads=2, d_ff=64,
    n_mels=8, n_ctx=32, vocab_size=128, max_target_positions=128,
    decoder_start_token_id=101,
)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tethys_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(timeout_s=60)
    import numpy as np

    from tethys_tpu.train import jobs

    assert jax.process_count() == 4, jax.process_count()
    # checkpointing ON: the in-loop epoch save writes the stage-sharded
    # packed state through Orbax, which serializes each process's own
    # shards — a bare jax.device_get in CheckpointManager.save would raise
    # on the non-addressable stages (the multi-host save fix this pins).
    # The directory must be IDENTICAL across processes (Orbax coordinates
    # the write); derive it from the cluster's unique chief address.
    chief = json.loads(os.environ["TF_CONFIG"])["cluster"]["chief"][0]
    ckpt_dir = f"/tmp/tethys_mp_pp_ckpt_{chief.replace(':', '_').replace('.', '_')}"
    result, model, config = jobs.train_whisper(
        model_type="small",
        batch_size_per_replica=2,
        num_batches=2,
        checkpointing=True,
        checkpoint_dir=ckpt_dir,
        data_seq_len=64,
        config_overrides=TINY,
        pipeline_parallel=2,
        num_microbatches=2,
    )
    assert result.total_steps == 2

    # Multi-host --resume round-trip: restore_like the epoch checkpoint
    # (written AFTER the last step, so it equals the final state) into a
    # FRESH stage-sharded live state on every process, and check the
    # restored params match the gathered final tree.
    import optax

    from tethys_tpu.checkpoint import CheckpointManager
    from tethys_tpu.parallel import dp, pp

    mgr = CheckpointManager(ckpt_dir)
    tag = mgr.latest_tag(prefix="whisper_small")
    assert tag, os.listdir(ckpt_dir)
    mesh = pp.make_pp_mesh(pipeline_parallel=2)
    fresh = pp.init_pp_state(
        jobs._init_whisper(model, config, jax.random.PRNGKey(7)),
        dp.whisper_optimizer(), mesh, config)
    restored = mgr.restore_like(tag, fresh)
    stack_leaf = jax.tree_util.tree_leaves(restored.params["stack"])[0]
    assert {s.data.shape[0] for s in stack_leaf.addressable_shards} == {1}
    got = pp.gather_unpacked_params(restored.params, config.encoder_layers,
                                    mesh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        got, result.state.params)
    assert all(np.isfinite(result.losses)), result.losses
    # finalization gather returned the canonical tree on every process
    assert "layers_0" in result.state.params["model"]["encoder"]
    losses = ",".join(f"{l:.6f}" for l in result.losses)
    print(f"MP_PPJOB_OK process={jax.process_index()} losses={losses}",
          flush=True)


if __name__ == "__main__":
    main()
