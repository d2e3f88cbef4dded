"""Tracing / profiling / debugging channel (SURVEY.md §5.1-§5.3).

The reference's observability is ad-hoc per-sample timers
(``load_time``/``proc_time`` in every batch item, reference
``spec/dataset/cam_dataset.py:342-371``) and demo FPS prints
(``scripts/spec_demo.py:65-88``). Here it is a first-class channel:

  * :class:`StepTimer` — named wall-clock stages with running stats,
    printable as one line per log interval;
  * :func:`trace` — ``jax.profiler`` trace context (XLA timeline +
    HLO-level view in TensorBoard / Perfetto);
  * :func:`nan_guard` — jax debug-NaNs toggle (the analogue of
    Lightning's ``terminate_on_nan``, reference scripts/spec_train.py:115);
  * :func:`set_seed` — deterministic numpy + JAX PRNG seeding (replaces
    pare ``set_seed``).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional

import numpy as np


class StepTimer:
    """Accumulates wall-clock per named stage.

    Usage::
        timer = StepTimer()
        with timer('load'):
            batch = next(loader)
        with timer('step'):
            state, m = jit_step(state, batch)
        print(timer.report())
    """

    def __init__(self, window: int = 100):
        self.window = window
        self._samples: Dict[str, collections.deque] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dq = self._samples.setdefault(
                name, collections.deque(maxlen=self.window))
            dq.append(time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        dq = self._samples.get(name)
        return float(np.mean(dq)) if dq else float('nan')

    def report(self) -> str:
        parts = [f'{k} {self.mean(k) * 1e3:.1f}ms'
                 for k in sorted(self._samples)]
        return ' | '.join(parts)

    def as_dict(self) -> dict:
        return {k: self.mean(k) for k in self._samples}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin
    or Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def nan_guard(enable: bool = True):
    """Raise on any NaN produced inside jitted code (debug runs only —
    disables some fusion)."""
    import jax

    jax.config.update('jax_debug_nans', enable)


def set_seed(seed: int):
    """Seed numpy and return a JAX PRNGKey; seed < 0 leaves numpy alone
    (the reference convention SEED_VALUE=-1)."""
    import jax

    if seed >= 0:
        np.random.seed(seed)
    return jax.random.PRNGKey(max(seed, 0))


def check_batch_gradient(fn, batch_input, atol: float = 1e-6) -> bool:
    """Batch-independence check (the pare ``CheckBatchGradient`` utility,
    reference import scripts/spec_train.py:35-36): perturbing sample 0
    must not change any other sample's output. Catches cross-batch leaks
    (e.g. train-mode BatchNorm in an eval path, bad reshapes).

    Args:
      fn: batch -> output array with a leading batch dim.
      batch_input: (B, ...) array, B >= 2.
    """
    import jax.numpy as jnp

    base = fn(batch_input)
    perturbed = jnp.asarray(batch_input).at[0].add(1.0)
    out = fn(perturbed)
    leak = jnp.abs(out[1:] - base[1:]).max()
    return bool(leak <= atol)
