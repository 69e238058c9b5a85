"""Wav2Vec2 distributed job + tensor-size and per-value skewness profiling.

Drop-in equivalent of reference speech_jobs/wav2vec2_dist_tensorsize.py:
the job of jobs/wav2vec2_dist.py plus the wav2vec2-flavor TensorProfiler
(adds per-tensor in-graph value skewness computed as fused scalars inside the
train step), size-distribution skewness rollups, per-size log dirs
(tensor_logs_<size>), comparison tables, and per-task /result copies
(*_tensor_summary / *_tiresias / *_skewness / *_combined).

Note: the reference epilogue crashes on an undefined `weighted_avg_skewness`
(reference wav2vec2_dist_tensorsize.py:2172; SURVEY quirk #4) — fixed here,
the weighted average is actually computed.

Usage: python jobs/wav2vec2_dist_tensorsize.py --batch_size 4 --num_batches 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="wav2vec2 Distributed Speech Recognition "
                    "with Tensor Profiling"
    )
    add_common_flags(parser, num_batches_default=5, batch_size_default=1)
    parser.add_argument(
        "--model_size", type=str, default="small",
        choices=["tiny", "small", "base"],
    )
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
    print(f"selected model size: {args.model_size}")
    print(f"batch size per replica: {args.batch_size}, "
          f"global batch size: {args.batch_size * n_replicas}")
    print(f"num_batches: {args.num_batches}")
    print("Wav2Vec2 distributed training with tensor profiling...")
    artifacts.start_side_captures()

    log_dir = os.path.join(
        artifacts.workspace_dir(), f"tensor_logs_{args.model_size}")
    profiler = TensorProfiler(
        log_dir=log_dir, model_name=f"wav2vec2_{args.model_size}",
        flavor="wav2vec2",
    )

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
            profiler=profiler,
            collective_report=True,
        )
    jct = time.time() - start

    summary = profiler.save_final_results()
    profiler.print_comparison_tables()

    # Weighted average value-skewness across logged tensors (the reference
    # intended this but referenced an undefined variable — quirk #4 fixed).
    skews = summary.get("skewness_analysis", {}).get("value_skewness", {})
    if skews:
        weighted_avg_skewness = sum(skews.values()) / len(skews)
        print(f"Weighted average value skewness: {weighted_avg_skewness:.4f}")
    profiler.close()
    print(f"Tiresias TensorSize: "
          f"{summary.get('tiresias_tensorsize_mb', 0.0):.2f} MB/iteration")
    print(f"Model Skewness: {summary.get('model_skewness', 0.0):.2f}")

    jobs.finalize_job(result, f"wav2vec2_{args.model_size}_model", jct)
    task_type, task_index = mesh_lib.job_identity()
    profiler.write_result_copies(jct, task_type, task_index)


if __name__ == "__main__":
    main()
