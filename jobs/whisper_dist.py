"""Whisper-small distributed training job (TPU).

Drop-in equivalent of reference speech_jobs/whisper_dist.py (CLI, stdout
line protocol, JCT/result-file contract, checkpoint cadence), with the DP
runtime replaced by jit + shard_map over a device mesh.

Usage: python jobs/whisper_dist.py --batch_size 4 --num_batches 30
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Whisper-small Distributed Speech Recognition"
    )
    add_common_flags(parser, num_batches_default=40, batch_size_default=1)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (extension)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree over a 2-D (data, model)"
                             " mesh (extension; reference is DP-only)")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel degree over a (data, seq) "
                             "mesh: encoder time axis sharded (extension)")
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel degree over a (data, stage) "
                             "mesh: encoder layer stack GPipe-pipelined "
                             "(extension)")
    parser.add_argument("--microbatches", type=int, default=2,
                        help="microbatches per step under --pp")
    parser.add_argument("--remat", action="store_true",
                        help="checkpoint the forward pass (medium/large HBM)")
    parser.add_argument("--remat_layers", action="store_true",
                        help="per-layer nn.remat (holds only layer-boundary "
                             "activations; the capacity mode for "
                             "medium/large — stronger than --remat)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="accumulate N microbatches per optimizer step "
                             "(extension; batch_size must divide by N)")
    parser.add_argument("--model_size", type=str, default="small",
                        choices=["tiny", "base", "small", "medium", "large",
                                 "large-v3"],
                        help="whisper size preset (extension; the reference "
                             "job is fixed to its nonstandard 'small')")
    parser.add_argument("--master_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="master param/Adam-moment dtype; bfloat16 is "
                             "the single-chip capacity mode for "
                             "medium/large (pair with --remat_layers)")
    args = parser.parse_args()
    if sum(p > 1 for p in (args.tp, args.sp, args.pp)) > 1:
        parser.error("--tp, --sp and --pp are mutually exclusive")

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
    elif args.pp > 1:
        from tethys_tpu.parallel import pp as pp_lib

        mesh = pp_lib.make_pp_mesh(pipeline_parallel=args.pp)
        n_replicas = dict(mesh.shape)["data"]
    else:
        mesh = mesh_lib.make_data_mesh()
        n_replicas = mesh_lib.num_replicas(mesh)
    global_batch = args.batch_size * n_replicas
    print(f"batch size per replica: {args.batch_size}, "
          f"global batch size: {global_batch}")
    print(f"num_batches: {args.num_batches}")

    print("Whisper-small distributed training starting...")
    artifacts.start_side_captures()

    start = time.time()
    from tethys_tpu.utils.tracing import maybe_profiler_trace

    with maybe_profiler_trace(getattr(args, 'jax_profile', None)):
        result, _model, _config = jobs.train_whisper(
            model_type=args.model_size,
            batch_size_per_replica=args.batch_size,
            num_batches=args.num_batches,
            mesh=mesh,
            compute_dtype=args.dtype,
            resume=args.resume,
            collective_report=True,
            tensor_parallel=args.tp,
            seq_parallel=args.sp,
            pipeline_parallel=args.pp,
            num_microbatches=args.microbatches,
            remat=args.remat,
            grad_accum=args.grad_accum,
            master_dtype=args.master_dtype,
            config_overrides=(
                {"remat_layers": True} if args.remat_layers else None),
        )
    jct = time.time() - start
    jobs.finalize_job(result, f"whisper_{args.model_size}_model", jct)


if __name__ == "__main__":
    main()
