"""Profiling hooks: jax.profiler traces + GCUPS accounting.

Replaces the reference's only observability tools — the µs ``Timer``
(versalignUtil.h:115-144) and Debug-build matrix dumps (SURVEY.md §4.3) —
with structured tracing (XLA/TPU profiler) and throughput counters.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator

from versalignlib_tpu.utils.logging import get_logger

_log = get_logger("profiling")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _log.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class GcupsMeter:
    """Accumulates DP cell updates / wall time across calls.

    cells = sum over batches of read_len * ref_len * pairs (padded lengths,
    the same accounting the reference's harness implies — BASELINE.md).
    """

    cells: int = 0
    seconds: float = 0.0
    calls: int = 0

    @contextlib.contextmanager
    def measure(self, cells: int) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.cells += cells
        self.calls += 1

    @property
    def gcups(self) -> float:
        return self.cells / self.seconds / 1e9 if self.seconds else 0.0

    def report(self) -> str:
        return (
            f"{self.cells:.3e} cells in {self.seconds:.3f}s over "
            f"{self.calls} calls = {self.gcups:.2f} GCUPS"
        )
