"""The training loop with the reference's logging / checkpoint contracts.

Per-step stdout line (scraped by the scheduler harness from *_log.txt, so the
format is a compatibility contract — reference speech_jobs/whisper_dist.py:951,
wav2vec2_dist.py:1320):

    Step {i}, Loss: {loss:.4f}, Time: HH:MM:SS (경과: {elapsed:.2f}초, 스텝 시간: {dur:.2f}초)

Epoch header `Epoch {e+1}/{num_epochs}`; optional 50-step checkpoint cadence
(wav2vec2) and per-epoch checkpoints; the wav2vec2 loop additionally swallows
per-step exceptions and resets the iterator
(reference wav2vec2_dist.py:1367-1371).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, NamedTuple, Optional

import jax
import numpy as np

from tethys_tpu.checkpoint import CheckpointManager


class TrainLoopResult(NamedTuple):
    state: Any
    losses: list
    step_times: list
    total_steps: int


def run_training(
    step_fn: Callable,               # (state, batch, rng) -> (state, loss)
    dataset: Iterable,               # yields numpy batch tuples
    state: Any,
    rng: jax.Array,
    num_epochs: int = 1,
    max_iterations: int = 1,
    prepare_batch: Optional[Callable] = None,  # device placement / sharding
    checkpoint_manager: Optional[CheckpointManager] = None,
    checkpoint_every_steps: Optional[int] = None,
    checkpoint_tag: str = "model",
    epoch_checkpoint_tag: Optional[str] = None,
    resilient: bool = False,         # wav2vec2-style per-step exception reset
    step_hooks: tuple = (),          # callables(step, loss, duration, aux)
) -> TrainLoopResult:
    losses, step_times = [], []
    step = 0
    iterator = iter(dataset)
    start_time = time.time()

    for epoch in range(num_epochs):
        print(f"Epoch {epoch+1}/{num_epochs}")
        it = 0
        while it < max_iterations:
            try:
                try:
                    batch = next(iterator)
                except StopIteration:
                    iterator = iter(dataset)
                    batch = next(iterator)

                step_start = time.time()
                if prepare_batch is not None:
                    batch = prepare_batch(batch)
                step_rng = jax.random.fold_in(rng, step)
                outputs = step_fn(state, batch, step_rng)
                if len(outputs) == 3:
                    state, loss, aux = outputs
                else:
                    (state, loss), aux = outputs, None
                loss_value = float(jax.device_get(loss))
                step_end = time.time()

                step_duration = step_end - step_start
                elapsed = step_end - start_time
                print(
                    f"Step {step}, Loss: {loss_value:.4f}, "
                    f"Time: {time.strftime('%H:%M:%S')} "
                    f"(경과: {elapsed:.2f}초, 스텝 시간: {step_duration:.2f}초)"
                )
                losses.append(loss_value)
                step_times.append(step_duration)
                for hook in step_hooks:
                    hook(step, loss_value, step_duration, aux)
                step += 1
                it += 1

                if (
                    checkpoint_manager is not None
                    and checkpoint_every_steps
                    and step % checkpoint_every_steps == 0
                ):
                    checkpoint_manager.save(f"{checkpoint_tag}_step_{step}", state)
            except Exception as e:  # noqa: BLE001
                if not resilient:
                    raise
                print(f"Error at step {step}: {e}")
                iterator = iter(dataset)
                it += 1
                continue

        if checkpoint_manager is not None:
            tag = epoch_checkpoint_tag or checkpoint_tag
            checkpoint_manager.save(f"{tag}_epoch_{epoch+1}", state)

    return TrainLoopResult(state, losses, step_times, step)


def steady_state_step_time(step_times, warmup: int = 3) -> float:
    """Mean step time after dropping warm-up (compile) steps."""
    if not step_times:
        return 0.0
    tail = step_times[warmup:] or step_times
    return float(np.mean(tail))
