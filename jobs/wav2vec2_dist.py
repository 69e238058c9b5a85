"""Wav2Vec2 distributed pretraining job (tiny/small/base) on TPU.

Drop-in equivalent of reference speech_jobs/wav2vec2_dist.py: same CLI,
hardened train step (NaN scrub, 1/N loss scaling, double clipping), 50-step +
epoch checkpoint cadence, JCT contract.

Usage: python jobs/wav2vec2_dist.py --batch_size 4 --num_batches 30 --model_size small
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="wav2vec2 Distributed Speech Recognition"
    )
    add_common_flags(parser, num_batches_default=5, batch_size_default=1)
    parser.add_argument(
        "--model_size", type=str, default="small",
        choices=["tiny", "small", "base"],
        help="Model size: tiny (~15-20M params), small (~30-40M params), "
             "base (~95M params)",
    )
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (extension)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree over a 2-D (data, model)"
                             " mesh (extension; reference is DP-only)")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel degree over a (data, seq) "
                             "mesh (extension; pays off for long-audio "
                             "configs — post-conv T is ~100 at 2 s clips)")
    parser.add_argument("--remat", action="store_true",
                        help="checkpoint the forward pass (large-model HBM)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="accumulate N microbatches per optimizer step "
                             "(extension; batch_size must divide by N)")
    args = parser.parse_args()
    if args.tp > 1 and args.sp > 1:
        parser.error("--tp and --sp are mutually exclusive")

    from tethys_tpu.parallel import mesh as mesh_lib
    from tethys_tpu.train import jobs
    from tethys_tpu.utils import artifacts

    mesh_lib.initialize_distributed()
    if args.tp > 1:
        from tethys_tpu.parallel import tp as tp_lib

        mesh = tp_lib.make_2d_mesh(model_parallel=args.tp)
        n_replicas = dict(mesh.shape)["data"]
    elif args.sp > 1:
        from tethys_tpu.parallel import sp as sp_lib

        mesh = sp_lib.make_seq_mesh(seq_parallel=args.sp)
        n_replicas = dict(mesh.shape)["data"]
    else:
        mesh = mesh_lib.make_data_mesh()
        n_replicas = mesh_lib.num_replicas(mesh)
    global_batch = args.batch_size * n_replicas
    print(f"selected model size: {args.model_size}")
    print(f"batch size per replica: {args.batch_size}, "
          f"global batch size: {global_batch}")
    print(f"num_batches: {args.num_batches}")

    print("Wav2Vec2 distributed training starting...")
    artifacts.start_side_captures()

    start = time.time()
    from tethys_tpu.utils.tracing import maybe_profiler_trace

    with maybe_profiler_trace(getattr(args, 'jax_profile', None)):
        result, _model, _config = jobs.train_wav2vec2(
            model_type="pretraining",
            model_size=args.model_size,
            batch_size_per_replica=args.batch_size,
            num_batches=args.num_batches,
            mesh=mesh,
            compute_dtype=args.dtype,
            resume=args.resume,
            collective_report=True,
            tensor_parallel=args.tp,
            seq_parallel=args.sp,
            remat=args.remat,
            grad_accum=args.grad_accum,
        )
    jct = time.time() - start
    jobs.finalize_job(result, f"wav2vec2_{args.model_size}_model", jct)


if __name__ == "__main__":
    main()
