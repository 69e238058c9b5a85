"""Stable-tier Wav2Vec2 distributed job (base-only, real CTC, simple loop).

Equivalent of reference stable_jobs/wav2vec2_dist.py: fixed base model, the
real `tf.nn.ctc_loss`-style CTC implementation available on the ASR head
(stable_jobs/wav2vec2_dist.py:897-929), and the older non-resilient training
loop (no per-step exception reset).

Usage: python jobs/stable/wav2vec2_dist.py --batch_size 4 --num_batches 30
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="wav2vec2 Distributed Speech Recognition"
    )
    add_common_flags(parser, num_batches_default=5, batch_size_default=1)
    args = parser.parse_args()

    from tethys_tpu.parallel import mesh as mesh_lib
    from tethys_tpu.train import jobs
    from tethys_tpu.utils import artifacts

    mesh_lib.initialize_distributed()
    mesh = mesh_lib.make_data_mesh()
    n_replicas = mesh_lib.num_replicas(mesh)
    print(f"batch size per replica: {args.batch_size}, "
          f"global batch size: {args.batch_size * n_replicas}")
    print(f"num_batches: {args.num_batches}")
    print("Wav2Vec2-base distributed training starting...")
    artifacts.start_side_captures()

    start = time.time()
    from tethys_tpu.utils.tracing import maybe_profiler_trace

    with maybe_profiler_trace(getattr(args, 'jax_profile', None)):
        result, _model, _config = jobs.train_wav2vec2(
            model_type="pretraining",
            model_size="base",
            batch_size_per_replica=args.batch_size,
            num_batches=args.num_batches,
            mesh=mesh,
            compute_dtype=args.dtype,
            real_ctc=True,
            collective_report=True,
        )
    jct = time.time() - start
    jobs.finalize_job(result, "wav2vec2_base_model", jct)


if __name__ == "__main__":
    main()
