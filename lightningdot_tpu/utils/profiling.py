"""Profiling helpers (replace the reference's wall-clock-only logging,
SURVEY.md §5: throughput counters in pretrain.py:503-525).

``trace(logdir)`` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf; ``Throughput`` mirrors the ex/s / in/s counters.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """ex/s / unit/s counters per task (pretrain.py:503-525 semantics)."""

    def __init__(self):
        self.t0 = time.time()
        self.n_examples: Dict[str, int] = defaultdict(int)
        self.n_units: Dict[str, int] = defaultdict(int)

    def update(self, task: str, n_examples: int, n_units: int = 0) -> None:
        self.n_examples[task] += n_examples
        self.n_units[task] += n_units

    def rates(self) -> Dict[str, Dict[str, float]]:
        elapsed = max(time.time() - self.t0, 1e-9)
        return {t: {"ex_per_s": self.n_examples[t] / elapsed,
                    "units_per_s": self.n_units[t] / elapsed}
                for t in self.n_examples}
