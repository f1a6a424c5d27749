"""Dispatcher backend wiring the Pallas TPU kernels.

Score path: Pallas interpair kernel (pallas_score.py). Align path: Pallas
pointer-matrix kernel when available, else the XLA scan kernel — both decode
on host (ops/traceback.py), mirroring the reference split between device DP
fill and scalar backtrack (SSEKernel.cpp:785-860).
"""

from __future__ import annotations

from versalignlib_tpu.ops.pallas_score import PallasScorer, _is_tpu
from versalignlib_tpu.types import Algorithm


class PallasBackend:
    name = "pallas"

    def __init__(self, interpret: bool | None = None):
        self._scorer = PallasScorer(interpret=interpret)
        self._xla = None

    def is_available(self) -> bool:
        # "auto" should only pick this backend where it compiles (TPU); the
        # interpreter path still works when selected explicitly (tests), but
        # is orders of magnitude slower than the XLA backend on CPU.
        return _is_tpu() or not self._scorer.interpret

    def score_alignments(self, algorithm, reads, refs, params):
        return self._scorer(reads, refs, params, Algorithm(algorithm))

    def compute_alignments(self, algorithm, reads, refs, params, tie):
        if params.affine:
            from versalignlib_tpu.ops.pallas_align import pallas_align_affine_batch

            return pallas_align_affine_batch(
                reads, refs, params, Algorithm(algorithm),
                interpret=self._scorer.interpret,
            )
        try:
            from versalignlib_tpu.ops.pallas_align import pallas_align_batch

            return pallas_align_batch(
                reads, refs, params, Algorithm(algorithm), tie,
                interpret=self._scorer.interpret,
            )
        except ImportError:
            if self._xla is None:
                from versalignlib_tpu.ops.xla import XLABackend

                self._xla = XLABackend()
            return self._xla.compute_alignments(algorithm, reads, refs, params, tie)
