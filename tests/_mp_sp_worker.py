"""Four-process SEQUENCE-PARALLEL worker, launched by tests/test_multiprocess.py.

The (data=2, seq=2) SP trainer across PROCESS boundaries: the whisper
encoder's time axis is sharded across two processes per data replica, so
GSPMD's auto-'seq' collectives (the K/V all-gathers the attention needs and
the grad reduce-scatters) ride gloo between real processes, alongside the
manual-'data' psum.

Each process prints `MP_SP_OK process=<i> loss=<loss>`; the parent asserts
all four report the identical SUM-of-replica-losses and that it equals the
DP golden it computes locally on the same params/batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests._mp_pp_worker import build_model_and_batch  # noqa: E402


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tethys_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(timeout_s=60)
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from tethys_tpu.parallel import dp, sp

    assert jax.process_count() == 4, jax.process_count()
    devices = np.asarray(jax.devices()).reshape(2, 2)
    mesh = Mesh(devices, ("data", "seq"))

    model, config, params, feats, labels = build_model_and_batch()

    def loss_fn(p, batch, rng):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    opt = optax.sgd(0.0)  # lr 0: the assertion is about the loss contract
    state = sp.init_sp_state(params, opt, mesh)
    step = sp.make_sp_train_step(loss_fn, opt, mesh)
    batch = dp.shard_batch((feats, labels), mesh)
    _, loss = step(state, batch, jax.random.PRNGKey(0))
    loss = float(jax.device_get(loss))
    print(f"MP_SP_OK process={jax.process_index()} loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
