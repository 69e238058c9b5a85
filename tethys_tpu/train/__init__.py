from tethys_tpu.train.loop import run_training, TrainLoopResult  # noqa: F401
