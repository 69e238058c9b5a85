"""Whisper distributed job + Tiresias tensor-size instrumentation.

Drop-in equivalent of reference speech_jobs/whisper_dist_tensorsize.py:
the training job of jobs/whisper_dist.py plus the TensorProfiler producing
tensor_sizes.txt / memory_usage.txt / summary.txt / tiresias_tensorsize.txt /
skewness_analysis.* / final_summary.json / tiresias_result.json /
legacy_skewness_result.txt under <workspace>/tensor_logs, comparison tables
on stdout, and per-task /result copies.

Usage: python jobs/whisper_dist_tensorsize.py --batch_size 4 --num_batches 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Whisper-small Distributed Speech Recognition "
                    "with Tensor Profiling"
    )
    add_common_flags(parser, num_batches_default=40, batch_size_default=1)
    parser.add_argument(
        "--log_tensor_freq", type=int, default=1,
        help="log tensor sizes every N steps",
    )
    args = parser.parse_args()

    from tethys_tpu.parallel import mesh as mesh_lib
    from tethys_tpu.profiling import TensorProfiler
    from tethys_tpu.train import jobs
    from tethys_tpu.utils import artifacts

    mesh_lib.initialize_distributed()
    mesh = mesh_lib.make_data_mesh()
    n_replicas = mesh_lib.num_replicas(mesh)
    print(f"batch size per replica: {args.batch_size}, "
          f"global batch size: {args.batch_size * n_replicas}")
    print(f"num_batches: {args.num_batches}")
    print("Whisper-small distributed training with tensor profiling...")
    artifacts.start_side_captures()

    log_dir = os.path.join(artifacts.workspace_dir(), "tensor_logs")
    profiler = TensorProfiler(log_dir=log_dir, model_name="whisper_small",
                              flavor="whisper")

    start = time.time()
    from tethys_tpu.utils.tracing import maybe_profiler_trace

    with maybe_profiler_trace(getattr(args, 'jax_profile', None)):
        result, _model, _config = jobs.train_whisper(
            model_type="small",
            batch_size_per_replica=args.batch_size,
            num_batches=args.num_batches,
            mesh=mesh,
            compute_dtype=args.dtype,
            profiler=profiler,
            collective_report=True,
        )
    jct = time.time() - start

    summary = profiler.save_final_results()
    profiler.print_comparison_tables()
    profiler.close()
    print(f"Tiresias TensorSize: "
          f"{summary.get('tiresias_tensorsize_mb', 0.0):.2f} MB/iteration")
    print(f"Model Skewness: {summary.get('model_skewness', 0.0):.2f}")

    jobs.finalize_job(result, "whisper_small_model", jct)
    task_type, task_index = mesh_lib.job_identity()
    profiler.write_result_copies(jct, task_type, task_index)


if __name__ == "__main__":
    main()
