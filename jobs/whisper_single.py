"""Single-device job — Wav2Vec2-base pretraining (5 s clips).

Parity quirk, kept deliberately: the reference file named `whisper_single.py`
actually contains the Wav2Vec2-base model and trains contrastive pretraining
on 80000-sample (5 s) clips (reference speech_jobs/whisper_single.py:10
defines Wav2Vec2Config; SURVEY §0 / quirk #1).  This entry point mirrors that
behavior, including the `single_jct.txt` contract.

Usage: python jobs/whisper_single.py --batch_size 4 --num_batches 40
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._common import add_common_flags  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="wav2vec2 Single GPU Speech Recognition"
    )
    add_common_flags(parser, num_batches_default=40, batch_size_default=4)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (extension)")
    args = parser.parse_args()

    from tethys_tpu.parallel import mesh as mesh_lib
    from tethys_tpu.train import jobs
    from tethys_tpu.utils import artifacts

    mesh = mesh_lib.make_data_mesh(1)
    print(f"batch size: {args.batch_size}")
    print(f"num_batches: {args.num_batches}")
    print("Wav2Vec2 single-device training starting...")
    artifacts.start_side_captures()  # gpu.sh-equivalent chip-monitor capture

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
            audio_length=80000,  # 5 s clips (reference whisper_single.py:1102)
            resume=args.resume,
        )
    jct = time.time() - start
    print("Training completed.")
    print("jct:", jct)
    from tethys_tpu.utils.artifacts import write_jct

    write_jct(jct, None, None, single=True)
    from tethys_tpu.checkpoint import save_final_weights

    try:
        save_final_weights(result.state.params, "wav2vec2_model")
    except Exception as e:  # noqa: BLE001
        print(f"final weight save failed: {e}")


if __name__ == "__main__":
    main()
