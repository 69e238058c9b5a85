"""The training loop with the reference's logging / checkpoint contracts.

Per-step stdout line (scraped by the scheduler harness from *_log.txt, so the
format is a compatibility contract — reference speech_jobs/whisper_dist.py:951,
wav2vec2_dist.py:1320):

    Step {i}, Loss: {loss:.4f}, Time: HH:MM:SS (경과: {elapsed:.2f}초, 스텝 시간: {dur:.2f}초)

Epoch header `Epoch {e+1}/{num_epochs}`; optional 50-step checkpoint cadence
(wav2vec2) and per-epoch checkpoints; the wav2vec2 loop additionally swallows
per-step exceptions and resets the iterator
(reference wav2vec2_dist.py:1367-1371).

The loss fetch is PIPELINED one step deep: step i is dispatched (async under
jit), then step i-1's loss is materialized and printed while the device runs
step i.  The reference's TF runtime got this overlap for free from its async
executor; a naive `float(loss)` per step instead blocks the host on the
device (measured ~26 ms/step through a tunneled TPU runtime, ~4 ms on a
local chip).  Print order, line format, loss values, and checkpoint cadence
are unchanged — only the blocking point moves.  The pending step is flushed
before any checkpoint save and at epoch end, so stdout ordering relative to
checkpoint messages is also unchanged.
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


class _PendingFetchError(Exception):
    """A pipelined loss fetch failed: the DEVICE computation of step `idx`
    (dispatched one iteration earlier) raised when materialized.  Carries
    the true step index so the resilient handler attributes the error to
    the step that failed, not the one being dispatched."""

    def __init__(self, idx: int, cause: BaseException):
        super().__init__(f"step {idx}: {cause}")
        self.idx = idx
        self.cause = cause


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
    # One-deep pipeline of the loss materialization (module doc):
    # (step_idx, loss handle, aux, dispatch-start time).
    pending = None
    last_ready = start_time

    def flush_pending():
        nonlocal pending
        entry, pending = pending, None
        flush_entry(entry)

    def final_flush():
        """Epoch-end / loop-end flush: unwrap the pipelined fetch error so
        non-resilient callers see the original exception; resilient loops
        log it like any other per-step failure."""
        try:
            flush_pending()
        except _PendingFetchError as e:
            if not resilient:
                raise e.cause
            print(f"Error at step {e.idx}: {e.cause}")

    def flush_entry(entry):
        """Materialize + print one step's loss (blocks until that step's
        device work is done — by then the NEXT step is usually already
        running).  A device-side failure surfaces here as
        _PendingFetchError carrying the step's own index."""
        nonlocal last_ready
        if entry is None:
            return
        idx, loss, aux, p_start = entry
        try:
            loss_value = float(jax.device_get(loss))
        except Exception as e:  # noqa: BLE001 — poisoned device result
            raise _PendingFetchError(idx, e) from e
        now = time.time()
        # Ready-to-ready in the pipelined steady state (≈ device step time);
        # anchored at dispatch start after a gap (checkpoint, epoch turn).
        step_duration = now - max(p_start, last_ready)
        last_ready = now
        elapsed = now - start_time
        print(
            f"Step {idx}, Loss: {loss_value:.4f}, "
            f"Time: {time.strftime('%H:%M:%S')} "
            f"(경과: {elapsed:.2f}초, 스텝 시간: {step_duration:.2f}초)"
        )
        losses.append(loss_value)
        step_times.append(step_duration)
        for hook in step_hooks:
            hook(idx, loss_value, step_duration, aux)

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
                # Register step i FIRST, then block on step i-1: if the
                # i-1 fetch raises, step i's handle stays in the pipeline
                # (its line/hooks are flushed next iteration or error on
                # their own).
                prev, pending = pending, (step, loss, aux, step_start)
                step += 1
                it += 1
                flush_entry(prev)        # step-(i-1) fetch overlaps step i

                if (
                    checkpoint_manager is not None
                    and checkpoint_every_steps
                    and step % checkpoint_every_steps == 0
                ):
                    flush_pending()      # keep stdout order vs ckpt messages
                    checkpoint_manager.save(f"{checkpoint_tag}_step_{step}", state)
            except _PendingFetchError as e:
                if not resilient:
                    raise e.cause
                # Attributed to the step whose DEVICE computation failed
                # (one behind the dispatch counter); counters were already
                # advanced when that step dispatched.
                print(f"Error at step {e.idx}: {e.cause}")
                iterator = iter(dataset)
                continue
            except Exception as e:  # noqa: BLE001
                if not resilient:
                    raise
                failed = step
                try:
                    # A dispatch-time error leaves the previous (pending)
                    # step valid — print its line before the error line.
                    flush_pending()
                except _PendingFetchError as pe:
                    print(f"Error at step {pe.idx}: {pe.cause}")
                except Exception:  # noqa: BLE001 — poisoned loss handle
                    pending = None
                print(f"Error at step {failed}: {e}")
                iterator = iter(dataset)
                it += 1
                continue

        final_flush()                    # epoch's last line before any epilogue
        if checkpoint_manager is not None:
            tag = epoch_checkpoint_tag or checkpoint_tag
            checkpoint_manager.save(f"{tag}_epoch_{epoch+1}", state)

    final_flush()
    return TrainLoopResult(state, losses, step_times, step)


def steady_state_step_time(step_times, warmup: int = 3) -> float:
    """Mean step time after dropping warm-up (compile) steps."""
    if not step_times:
        return 0.0
    tail = step_times[warmup:] or step_times
    return float(np.mean(tail))
