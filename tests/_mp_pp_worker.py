"""Four-process PIPELINE-PARALLEL worker, launched by tests/test_multiprocess.py.

The GPipe trainer across PROCESS boundaries: TF_CONFIG ->
initialize_distributed() -> 4-process global (data=2, stage=2) mesh over
single-device processes -> tiny whisper with the encoder layer stack split
one-layer-per-stage ACROSS two processes per data replica -> one PP train
step whose `jax.lax.ppermute` activation hops (forward AND the reversed
backward hops), 'stage' gradient psums, and 'data' loss/grad psums all ride
gloo between real processes.

Each process prints `MP_PP_OK process=<i> loss=<loss>`; the parent asserts
all four report the identical SUM-of-replica-losses and that it equals the
DP golden it computes locally on the same params/batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = dict(
    d_model=32, encoder_layers=2, encoder_attention_heads=2,
    decoder_layers=1, decoder_attention_heads=2, d_ff=64,
    n_mels=8, n_ctx=32, vocab_size=64, max_target_positions=32,
    decoder_start_token_id=63,
)


def build_model_and_batch():
    """Deterministic tiny whisper + batch — identical in every process and
    in the parent (which computes the DP golden from the same values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tethys_tpu.models.whisper import create_whisper_model

    model, config = create_whisper_model("tiny", **TINY)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, config.n_mels, 64)),
                        dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(3, 60, size=(4, 8)), dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        feats[:1], labels=labels[:1], deterministic=True,
    )["params"]
    return model, config, params, feats, labels


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tethys_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(timeout_s=60)
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from tethys_tpu.parallel import dp, pp

    assert jax.process_count() == 4, jax.process_count()
    # Processes (0,1) hold data replica 0's two stages; (2,3) replica 1's.
    devices = np.asarray(jax.devices()).reshape(2, 2)
    mesh = Mesh(devices, ("data", "stage"))

    model, config, params, feats, labels = build_model_and_batch()
    opt = optax.sgd(0.0)  # lr 0: the assertion is about the loss contract
    state = pp.init_pp_state(params, opt, mesh, config)
    stack_leaf = jax.tree_util.tree_leaves(state.params["stack"])[0]
    # each process owns exactly its stage's [1, ...] slice of the [2, ...]
    # layer stack
    local = {s.data.shape[0] for s in stack_leaf.addressable_shards}
    assert local == {1}, local

    step = pp.make_pp_train_step(model, opt, mesh, state,
                                 num_microbatches=2, deterministic=True)
    batch = dp.shard_batch((feats, labels), mesh)
    # TWO steps: the second re-executes the compiled ppermute program (gloo
    # collective_permute reuse across calls — the multi-step job shape).
    # lr=0 keeps params fixed, so both steps produce the DP golden loss.
    new_state, loss = step(state, batch, jax.random.PRNGKey(0))
    new_state, loss = step(new_state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(loss))

    # The train_whisper(--pp) finalization path: other stages' shards are
    # NOT addressable from this process, so a bare device_get would raise —
    # gather_unpacked_params must all-gather and return the canonical tree.
    unpacked = pp.gather_unpacked_params(new_state.params,
                                         config.encoder_layers, mesh)
    assert "layers_0" in unpacked["model"]["encoder"], unpacked.keys()
    assert all(np.all(np.isfinite(np.asarray(leaf)))
               for leaf in jax.tree_util.tree_leaves(unpacked))

    print(f"MP_PP_OK process={jax.process_index()} loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
