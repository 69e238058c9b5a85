"""Four-process TENSOR-PARALLEL worker, launched by tests/test_multiprocess.py.

Extends the DP multi-process proof to the round-3 partial-manual trainer:
TF_CONFIG -> initialize_distributed() -> 4-process global (data=2, model=2)
mesh -> Megatron-sharded param spanning TWO processes per data replica ->
one hardened-free TP train step whose cross-process collectives (the
manual 'data' psum AND GSPMD's auto 'model' partitioning) ride gloo.

Each process prints `MP_TP_OK process=<i> loss=<loss>`; the parent asserts
all four report the identical, analytically-known SUM loss.
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
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from tethys_tpu.parallel import dp, tp

    assert jax.process_count() == 4, jax.process_count()
    devices = np.asarray(jax.devices()).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))

    # fc1/kernel so tp's Megatron rule shards the output dim over 'model'.
    params = {"fc1": {"kernel": jnp.ones((4, 16), jnp.float32)}}

    def loss_fn(p, batch, rng):
        del rng
        x, y = batch
        return jnp.mean((x @ p["fc1"]["kernel"] - y) ** 2), {}

    opt = optax.sgd(0.0)  # lr 0: the assertion is about the loss contract
    state = tp.init_tp_state(params, opt, mesh)
    k = state.params["fc1"]["kernel"]
    local_shapes = {s.data.shape for s in k.addressable_shards}
    assert local_shapes == {(4, 8)}, local_shapes  # model-sharded 2-way

    step = tp.make_tp_train_step(loss_fn, opt, mesh)
    pid = jax.process_index()
    data_replica = pid // 2  # processes (0,1) -> replica 0, (2,3) -> 1
    # x rows = data_replica+1 everywhere, w = ones -> pred col = 4*(r+1),
    # per-replica mse = 16*(r+1)^2; SUM over replicas = 16*1 + 16*4 = 80.
    x = np.full((1, 4), float(data_replica + 1), np.float32)
    y = np.zeros((1, 16), np.float32)
    batch = dp.shard_batch((x, y), mesh)
    _, loss = step(state, batch, jax.random.PRNGKey(0))
    loss = float(jax.device_get(loss))
    assert abs(loss - 80.0) < 1e-4, loss
    print(f"MP_TP_OK process={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
