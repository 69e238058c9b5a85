"""Wav2Vec2 single-device job with size/type/lr/epoch selection.

Drop-in equivalent of reference speech_jobs/wav2vec2_single.py: same CLI
(--model_size/--model_type/--learning_rate/--num_epochs), 2 s clips, relative
./model_cache final save, JCT printed (not written to /result — reference
behavior).

Usage: python jobs/wav2vec2_single.py --batch_size 4 --num_batches 30 \
           --model_size small --model_type pretraining
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Wav2Vec2 Single GPU Speech Recognition"
    )
    add_common_flags(parser, num_batches_default=5, batch_size_default=1)
    parser.add_argument(
        "--model_size", type=str, default="small",
        choices=["tiny", "small", "base"],
        help="Model size: tiny (~15-20M params), small (~30-40M params), "
             "base (~95M params)",
    )
    parser.add_argument(
        "--model_type", type=str, default="pretraining",
        choices=["pretraining", "asr", "classification"],
        help="Model type for training",
    )
    parser.add_argument("--learning_rate", type=float, default=3e-5,
                        help="Learning rate")
    parser.add_argument("--num_epochs", type=int, default=1,
                        help="Number of epochs")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (extension)")
    args = parser.parse_args()

    from tethys_tpu.parallel import mesh as mesh_lib
    from tethys_tpu.train import jobs
    from tethys_tpu.checkpoint import save_final_weights

    mesh = mesh_lib.make_data_mesh(1)
    print("Wav2Vec2 single-device training starting...")
    print(f"selected model size: {args.model_size}")
    print(f"selected model type: {args.model_type}")

    start = time.time()
    from tethys_tpu.utils.tracing import maybe_profiler_trace

    with maybe_profiler_trace(getattr(args, 'jax_profile', None)):
        result, _model, _config = jobs.train_wav2vec2(
            model_type=args.model_type,
            model_size=args.model_size,
            batch_size_per_replica=args.batch_size,
            num_batches=args.num_batches,
            num_epochs=args.num_epochs,
            learning_rate=args.learning_rate,
            mesh=mesh,
            compute_dtype=args.dtype,
            resume=args.resume,
        )
    jct = time.time() - start
    print("Training completed.")
    print("JCT:", jct)

    cache_dir = "./model_cache"  # relative path — reference behavior
    os.makedirs(cache_dir, exist_ok=True)
    try:
        save_final_weights(
            result.state.params,
            f"wav2vec2_{args.model_size}_{args.model_type}_model",
            cache_dir=cache_dir,
        )
    except Exception as e:  # noqa: BLE001
        print(f"final weight save failed: {e}")


if __name__ == "__main__":
    main()
