"""Two-process DP worker, launched by tests/test_multiprocess.py.

Exercises the REAL multi-host path the reference relies on
(speech_jobs/wav2vec2_dist.py:1463-1475: TF_CONFIG -> MWMS over gRPC):
TF_CONFIG -> initialize_distributed() -> jax.distributed.initialize over
localhost -> 2-process global mesh -> one shard_map DP train step with a
cross-process psum.

Run with env: TF_CONFIG (chief/worker cluster spec), JAX_PLATFORMS=cpu.
Prints `MP_OK process=<i> loss=<sum-reduced loss>` on success; the parent
asserts both processes report the identical SUM loss.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # Test-harness platform forcing: this image's sitecustomize registers a
    # TPU backend in every process; pin CPU + gloo cross-process collectives
    # before any backend init.  (A real TPU cluster needs neither.)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # initialize_distributed must precede any backend-initializing JAX call.
    from tethys_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(timeout_s=60)
    import jax.numpy as jnp
    import numpy as np

    from tethys_tpu.parallel import dp

    want_n = int(os.environ.get("MP_EXPECT_PROCESSES", "2"))
    assert jax.process_count() == want_n, (
        f"process_count={jax.process_count()} want {want_n}")
    mesh = mesh_lib.make_data_mesh(want_n)

    params = {"w": jnp.ones((4, 4), jnp.float32),
              "b": jnp.zeros((4,), jnp.float32)}
    optimizer = dp.whisper_optimizer(1e-2)
    state = dp.replicate_state(
        dp.TrainState(params, optimizer.init(params)), mesh)

    def loss_fn(p, batch, rng):
        del rng
        x, y = batch
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2), {}

    step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=False)
    pid = jax.process_index()
    # Deterministic per-process shard: replica i sees x=i+1 (mse 16*(i+1)^2);
    # the logged loss is the MWMS-style SUM over replicas.
    x = np.full((1, 4), float(pid + 1), np.float32)
    y = np.zeros((1, 4), np.float32)
    batch = dp.shard_batch((x, y), mesh)
    _, loss = step(state, batch, jax.random.PRNGKey(0))
    loss = float(jax.device_get(loss))
    assert np.isfinite(loss), loss
    print(f"MP_OK process={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
