"""run_training's pipelined loss fetch: ordering, error attribution, and
the stdout contract (reference speech_jobs/whisper_dist.py:939-951 /
wav2vec2_dist.py:1320, 1367-1371).

The loss fetch is pipelined one step deep (train/loop.py module doc), so a
device-side failure surfaces one iteration after its dispatch; these tests
pin that the error is attributed to the step that FAILED (not the one being
dispatched) and that the in-flight step's loss line is not dropped —
code-review findings, round 4.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from tethys_tpu.train.loop import run_training

LINE_RE = re.compile(
    r"^Step (\d+), Loss: (\d+\.\d{4}), Time: \d{2}:\d{2}:\d{2} "
    r"\(경과: \d+\.\d{2}초, 스텝 시간: \d+\.\d{2}초\)$")


class _BadLoss:
    """Stands in for a poisoned device result: fetch raises."""

    def __float__(self):
        raise RuntimeError("device computation failed")


def _dataset():
    while True:
        yield (jnp.ones((2,)),)


def _step_fn(fail_at=()):
    def step(state, batch, rng):
        i = state
        loss = _BadLoss() if i in fail_at else jnp.float32(float(i))
        return i + 1, loss
    return step


def test_pipelined_lines_in_order(capsys):
    result = run_training(_step_fn(), _dataset(), state=0,
                          rng=jax.random.PRNGKey(0), max_iterations=5)
    out = capsys.readouterr().out.splitlines()
    step_lines = [line for line in out if line.startswith("Step ")]
    assert [LINE_RE.match(line).group(1) for line in step_lines] == [
        "0", "1", "2", "3", "4"]
    assert result.losses == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert result.total_steps == 5


def test_resilient_fetch_error_attributed_to_failed_step(capsys):
    """Step 2's DEVICE result fails: the error line must name step 2 (not
    step 3, whose dispatch triggered the fetch), and step 3's loss line
    must still be printed (its handle stays in the pipeline)."""
    result = run_training(_step_fn(fail_at=(2,)), _dataset(), state=0,
                          rng=jax.random.PRNGKey(0), max_iterations=6,
                          resilient=True)
    out = capsys.readouterr().out
    assert "Error at step 2: device computation failed" in out
    assert "Error at step 3" not in out
    printed = [LINE_RE.match(line).group(1)
               for line in out.splitlines() if line.startswith("Step ")]
    assert printed == ["0", "1", "3", "4", "5"]
    assert result.losses == [0.0, 1.0, 3.0, 4.0, 5.0]
    assert result.total_steps == 6


def test_resilient_fetch_error_on_final_step(capsys):
    """A poisoned LAST step surfaces in the loop-end flush — logged, not
    raised, in resilient mode."""
    result = run_training(_step_fn(fail_at=(3,)), _dataset(), state=0,
                          rng=jax.random.PRNGKey(0), max_iterations=4,
                          resilient=True)
    out = capsys.readouterr().out
    assert "Error at step 3: device computation failed" in out
    assert result.losses == [0.0, 1.0, 2.0]


def test_non_resilient_fetch_error_raises_original():
    with pytest.raises(RuntimeError, match="device computation failed"):
        run_training(_step_fn(fail_at=(1,)), _dataset(), state=0,
                     rng=jax.random.PRNGKey(0), max_iterations=4)
